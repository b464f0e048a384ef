"""Energy-gradient and Fisher-information consistency checks.

Three test families, mirroring the reference's strategy (SURVEY §4):

1. finite-difference gradients of every likelihood energy
   (``/root/reference/test/test_energy_gradients.py`` runs
   ``check_operator``'s Jacobian-vs-finite-differences pass over every
   energy; here ``jax.grad`` plays the Jacobian role),
2. the *statistical* Fisher identity ``metric(p) == E_d[score score^T]``
   with data drawn from the model at ``p``
   (``/root/reference/test/test_operators/test_fisher_metric.py``:
   Nsamp-average of score outer products vs the implemented metric), and
3. a-priori correlated-field moment statistics vs realized sample
   statistics (``/root/reference/src/library/correlated_fields.py:
   1021-1115`` and its tests).

All checks run in f64 on small shapes; MC tolerances are scaled to the
Monte-Carlo error of the estimator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from nifty_tpu.tree import random_like, vdot

pmp = pytest.mark.parametrize

SHP = (5,)


def _tree_randn_like(rng, tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(
            rng.normal(size=jnp.shape(x)).astype(np.result_type(x))
            if not jnp.iscomplexobj(x)
            else (rng.normal(size=jnp.shape(x))
                  + 1j * rng.normal(size=jnp.shape(x)))
        ),
        tree,
    )


# -- case registry ------------------------------------------------------
# Each case provides: a likelihood factory from data, a data sampler at a
# given primal position (for the Fisher MC), and a safe random primal.

def _cases(rng):
    cases = {}

    c = 4.0  # noise_cov_inv = c * id  =>  noise std = 1/sqrt(c)
    cases["gaussian"] = dict(
        make=lambda d: jft.Gaussian(d, noise_cov_inv=lambda x: c * x),
        sample=lambda k, p: p + jax.random.normal(k, jnp.shape(p)) / np.sqrt(c),
        primals=lambda: jnp.asarray(rng.normal(size=SHP)),
    )

    dof = 4.0
    s = 0.5  # noise_std_inv = 1/s
    cases["studentt"] = dict(
        make=lambda d: jft.StudentT(d, dof=dof, noise_std_inv=lambda x: x / s),
        sample=lambda k, p: p + s * jax.random.t(k, dof, jnp.shape(p)),
        primals=lambda: jnp.asarray(rng.normal(size=SHP)),
    )

    cases["poisson"] = dict(
        make=lambda d: jft.Poissonian(d),
        sample=lambda k, p: jax.random.poisson(k, p, jnp.shape(p)),
        primals=lambda: jnp.asarray(rng.uniform(3.0, 12.0, size=SHP)),
    )

    cases["bernoulli"] = dict(
        make=lambda d: jft.Bernoulli(d),
        sample=lambda k, p: jax.random.bernoulli(k, p, jnp.shape(p)).astype(int),
        primals=lambda: jnp.asarray(rng.uniform(0.25, 0.75, size=SHP)),
    )

    cases["vcgauss"] = dict(
        make=lambda d: jft.VariableCovarianceGaussian(d),
        sample=lambda k, p: p[0] + jax.random.normal(k, jnp.shape(p[0])) / p[1],
        primals=lambda: (jnp.asarray(rng.normal(size=SHP)),
                         jnp.asarray(rng.uniform(0.7, 1.8, size=SHP))),
    )

    cases["vcstudentt"] = dict(
        make=lambda d: jft.VariableCovarianceStudentT(d, dof=dof),
        sample=lambda k, p: p[0] + p[1] * jax.random.t(k, dof, jnp.shape(p[0])),
        primals=lambda: (jnp.asarray(rng.normal(size=SHP)),
                         jnp.asarray(rng.uniform(0.7, 1.8, size=SHP))),
    )

    def _cat_sample(k, p):
        return jax.random.categorical(k, p, axis=-1)[..., None]

    cases["categorical"] = dict(
        make=lambda d: jft.Categorical(d, axis=-1),
        sample=_cat_sample,
        primals=lambda: jnp.asarray(rng.normal(size=(3, 4))),
    )

    # InverseGamma likelihood on strictly positive data
    alpha, scl = 2.0, 3.0
    cases["invgamma"] = dict(
        make=lambda d: jft.likelihood_impl.InverseGamma(
            jnp.full(SHP, scl), alpha=alpha
        ).amend(lambda x: x, domain=jax.eval_shape(lambda: jnp.zeros(SHP))),
        sample=None,  # energy is over the *parameter*, data folded into beta
        primals=lambda: jnp.asarray(rng.uniform(1.0, 4.0, size=SHP)),
    )

    return cases


ALL_NAMES = ["gaussian", "studentt", "poisson", "bernoulli", "vcgauss",
             "vcstudentt", "categorical"]


# -- 1. finite-difference gradients -------------------------------------

@pmp("name", ALL_NAMES + ["invgamma"])
def test_energy_gradient_vs_finite_differences(name, rng):
    cases = _cases(rng)
    case = cases[name]
    p = case["primals"]()
    if case["sample"] is not None:
        data = case["sample"](jax.random.PRNGKey(3), p)
    else:
        data = None
    lh = case["make"](data) if data is not None else case["make"](None)

    e, g = jax.value_and_grad(lh)(p)
    assert np.isfinite(e)
    # central differences along 3 random tangent directions
    flat, unravel = jax.flatten_util.ravel_pytree(p)
    gflat, _ = jax.flatten_util.ravel_pytree(g)
    eps = 1e-5
    for _ in range(3):
        t = rng.normal(size=flat.shape)
        t /= np.linalg.norm(t)
        ep = lh(unravel(flat + eps * t))
        em = lh(unravel(flat - eps * t))
        fd = (ep - em) / (2 * eps)
        ref = float(gflat @ t)
        assert abs(fd - ref) <= 1e-5 * max(1.0, abs(ref)), (
            f"{name}: FD {fd} vs grad {ref}"
        )


# -- 2. statistical Fisher identity -------------------------------------

@pmp("name", ALL_NAMES)
def test_metric_is_expected_score_outer_product(name, rng):
    """metric(p)[t] must equal E_d[ score(d) <score(d), t> ] with data
    drawn from the model at p — the defining property of the Fisher
    information (reference: test_fisher_metric.py's Nsamp MC average)."""
    cases = _cases(rng)
    case = cases[name]
    p = case["primals"]()
    flat_p, unravel = jax.flatten_util.ravel_pytree(p)
    n = flat_p.size

    def score(key):
        d = case["sample"](key, p)
        lh = case["make"](d)
        g = jax.grad(lh)(p)
        return jax.flatten_util.ravel_pytree(g)[0]

    nsamp = 100_000
    keys = jax.random.split(jax.random.PRNGKey(7), nsamp)
    scores = jax.vmap(score)(keys)  # (nsamp, n)
    fisher_mc = (scores.T @ scores) / nsamp

    # materialize the implemented metric as a dense matrix
    lh0 = case["make"](case["sample"](jax.random.PRNGKey(11), p))
    eye = jnp.eye(n)

    def met_col(col):
        t = unravel(col)
        mt = lh0.metric(p, t)
        return jax.flatten_util.ravel_pytree(mt)[0]

    fisher_impl = jax.vmap(met_col)(eye).T

    # per-entry MC standard error of the outer-product average
    outer = scores[:, :, None] * scores[:, None, :]
    se = np.asarray(outer.std(axis=0)) / np.sqrt(nsamp)
    diff = np.abs(np.asarray(fisher_mc - fisher_impl))
    # 5-sigma elementwise, plus an absolute floor for ~zero entries
    tol = 5.0 * se + 5e-3 * np.abs(np.asarray(fisher_impl)).max()
    assert (diff <= tol).all(), (
        f"{name}: max violation {np.max(diff - tol):.3e}"
    )


@pmp("name", ALL_NAMES)
def test_score_has_zero_mean(name, rng):
    """E_d[score] = 0 at the true parameters (regularity check that the
    energies are correctly normalized in their parameter dependence)."""
    cases = _cases(rng)
    case = cases[name]
    p = case["primals"]()

    def score(key):
        d = case["sample"](key, p)
        lh = case["make"](d)
        return jax.flatten_util.ravel_pytree(jax.grad(lh)(p))[0]

    nsamp = 100_000
    keys = jax.random.split(jax.random.PRNGKey(13), nsamp)
    scores = jax.vmap(score)(keys)
    mean = np.asarray(scores.mean(axis=0))
    se = np.asarray(scores.std(axis=0)) / np.sqrt(nsamp)
    assert (np.abs(mean) <= 5 * se + 1e-12).all()


@pmp("name", ALL_NAMES)
def test_metric_positive_semidefinite(name, rng):
    cases = _cases(rng)
    case = cases[name]
    p = case["primals"]()
    lh = case["make"](case["sample"](jax.random.PRNGKey(5), p))
    flat_p, unravel = jax.flatten_util.ravel_pytree(p)
    n = flat_p.size

    def met_col(col):
        return jax.flatten_util.ravel_pytree(
            lh.metric(p, unravel(col))
        )[0]

    m = np.asarray(jax.vmap(met_col)(jnp.eye(n)).T)
    np.testing.assert_allclose(m, m.T, atol=1e-10)
    w = np.linalg.eigvalsh(0.5 * (m + m.T))
    assert w.min() >= -1e-10 * max(1.0, w.max())


# -- 3. correlated-field moments vs realized statistics -----------------

@pytest.mark.slow
def test_cf_total_fluctuation_matches_realized(rng):
    """`total_fluctuation` (a-priori moment operator) must predict the
    realized spatial-std statistic of prior samples (reference:
    correlated_fields.py:1021 + its consistency tests)."""
    cfm = jft.CorrelatedFieldMaker("m")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-3, 1e-4))
    cfm.add_fluctuations(
        (24,), distances=1.0 / 24, fluctuations=(2.0, 1e-3),
        loglogavgslope=(-3.0, 1e-3), flexibility=(1e-2, 1e-3),
        asperity=None,
    )
    cf = cfm.finalize()
    tot = cfm.total_fluctuation()

    nsamp = 300
    keys = jax.random.split(jax.random.PRNGKey(2), nsamp)

    def draw(k):
        p = cf.init(k)
        return cf(p), tot(p)

    fields, predicted = jax.vmap(draw)(keys)
    realized = jft.CorrelatedFieldMaker.total_fluctuation_realized(fields)
    pred = float(jnp.mean(predicted))
    # tight hyper-priors => predicted ~ const; realized fluctuates at
    # O(1/sqrt(nsamp)) around it
    assert abs(realized - pred) <= 0.15 * pred


@pytest.mark.slow
def test_cf_two_space_fluctuation_split(rng):
    """Multi-space a-priori moments: average/slice fluctuation relations
    over a 2-subgrid outer product (correlated_fields.py:1033-1068)."""
    cfm = jft.CorrelatedFieldMaker("m")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-3, 1e-4))
    common = dict(loglogavgslope=(-2.5, 1e-3), flexibility=(1e-2, 1e-3),
                  asperity=None)
    cfm.add_fluctuations((12,), 1.0 / 12, fluctuations=(1.0, 1e-3),
                         prefix="s0", **common)
    cfm.add_fluctuations((10,), 1.0 / 10, fluctuations=(0.5, 1e-3),
                         prefix="s1", **common)
    cf = cfm.finalize()

    tot = cfm.total_fluctuation()
    av0 = cfm.average_fluctuation(0)
    sl0 = cfm.slice_fluctuation(0)

    p = cf.init(jax.random.PRNGKey(4))
    t, a0, s0 = float(tot(p)), float(av0(p)), float(sl0(p))
    azm = float(cfm.azm(p))
    a1 = float(cfm.average_fluctuation(1)(p))
    # total^2 = ((1+ (a0/z)^2)(1+(a1/z)^2) - 1) z^2  (z = zero-mode)
    expect_t2 = ((1 + (a0 / azm) ** 2) * (1 + (a1 / azm) ** 2) - 1) * azm ** 2
    np.testing.assert_allclose(t ** 2, expect_t2, rtol=1e-6)
    # slice >= average within one space
    assert s0 > 0 and t > 0

    nsamp = 300
    keys = jax.random.split(jax.random.PRNGKey(9), nsamp)
    fields = jax.vmap(lambda k: cf(cf.init(k)))(keys)
    sub_axes = [(0,), (1,)]
    av0_real = jft.CorrelatedFieldMaker.average_fluctuation_realized(
        fields, sub_axes, 0
    )
    assert abs(av0_real - a0) <= 0.2 * a0


def test_duplicate_subgrid_prefix_raises(rng):
    """Two subgrids with the same prefix must fail fast (the reference
    silently overwrites latent keys and errors only at apply time)."""
    cfm = jft.CorrelatedFieldMaker("m")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1.0, 0.1))
    kw = dict(fluctuations=(1.0, 0.2), loglogavgslope=(-2.0, 0.2),
              flexibility=None, asperity=None)
    cfm.add_fluctuations((8,), 1.0 / 8, **kw)
    with pytest.raises(ValueError, match="prefix"):
        cfm.add_fluctuations((6,), 1.0 / 6, **kw)


def test_moment_slice_to_average_roundtrip(rng):
    cfm = jft.CorrelatedFieldMaker("m")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1.0, 0.1))
    cfm.add_fluctuations((8,), 1.0 / 8, fluctuations=(1.0, 0.2),
                         loglogavgslope=(-2.0, 0.2), flexibility=(1.0, 0.2),
                         asperity=None)
    val = cfm.moment_slice_to_average(2.0, nsamples=200)
    assert np.isfinite(val) and val > 0
    # with a single space the scale factor is the mean sqrt(1+r^2) >= 1
    assert val <= 2.0
