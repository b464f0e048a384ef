"""Likelihood-calculus consistency checks.

These re-create the reference's self-checking test strategy
(``src/extra.py:41,99`` ``check_linear_operator``/``check_operator``; used
throughout ``test/test_operators/``): metric = lsm∘rsm, lsm/rsm are
adjoint linear maps, the metric is the Gauss-Newton curvature of the
energy through the transformation, and freezing (point estimates) is
consistent with evaluating at the full position.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from nifty_tpu.tree import random_like, vdot

pmp = pytest.mark.parametrize


def _lh_cases(rng, key):
    k1, k2, k3 = jax.random.split(key, 3)
    shp = (6,)
    data = jnp.asarray(rng.normal(size=shp))
    cases = []
    cases.append(("gaussian", jft.Gaussian(data, noise_cov_inv=lambda x: 4.0 * x)))
    cases.append(("studentt", jft.StudentT(data, dof=3.0,
                                           noise_std_inv=lambda x: 2.0 * x)))
    counts = jnp.asarray(rng.poisson(10.0, size=shp))
    cases.append(("poisson", jft.Poissonian(counts)))
    cases.append(("vcgauss", jft.VariableCovarianceGaussian(data)))
    cases.append(("vcstudt", jft.VariableCovarianceStudentT(data, dof=3.0)))
    logits = jnp.asarray(rng.normal(size=(4, 3)))
    labels = jnp.asarray(rng.integers(0, 3, size=(4, 1)))
    cases.append(("categorical", jft.Categorical(labels)))
    return cases


def _primals_for(name, lh, rng):
    if name == "poisson":
        return jnp.asarray(rng.uniform(2.0, 10.0, size=(6,)))
    if name in ("vcgauss", "vcstudt"):
        return (jnp.asarray(rng.normal(size=(6,))),
                jnp.asarray(rng.uniform(0.5, 2.0, size=(6,))))
    if name == "categorical":
        return jnp.asarray(rng.normal(size=(4, 3)))
    return jnp.asarray(rng.normal(size=(6,)))


def test_metric_is_lsm_rsm(rng, key):
    for name, lh in _lh_cases(rng, key):
        if name == "categorical":
            # The categorical left-sqrt-metric is only an approximate root
            # (the reference carries the same caveat,
            # src/re/likelihood_impl.py:421 "FIXME: not sure if this is
            # really the square root"); its explicit metric is exact.
            continue
        p = _primals_for(name, lh, rng)
        t = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.normal(size=jnp.shape(x))), p
        )
        m1 = lh.metric(p, t)
        m2 = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
        for a, b in zip(jax.tree_util.tree_leaves(m1),
                        jax.tree_util.tree_leaves(m2)):
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9,
                                       err_msg=name)


def test_lsm_rsm_adjoint(rng, key):
    """<lsm(u), t>_domain == <u, rsm(t)>_data for every likelihood."""
    for name, lh in _lh_cases(rng, key):
        p = _primals_for(name, lh, rng)
        u = random_like(key, lh.lsm_tangents_shape)
        t = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.normal(size=jnp.shape(x))), p
        )
        lhs = vdot(lh.left_sqrt_metric(p, u), t)
        rhs = vdot(u, lh.right_sqrt_metric(p, t))
        np.testing.assert_allclose(float(lhs.real), float(rhs.real),
                                   rtol=1e-8, err_msg=name)


@pmp("name_idx", [0, 1, 2])
def test_metric_is_gauss_newton_curvature(rng, key, name_idx):
    """metric == J_T^dagger J_T with J_T the transformation Jacobian."""
    name, lh = _lh_cases(rng, key)[name_idx]
    p = _primals_for(name, lh, rng)
    t = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.normal(size=jnp.shape(x))), p
    )
    _, jt = jax.jvp(lh.transformation, (p,), (t,))
    _, vjp = jax.vjp(lh.transformation, p)
    gn = vjp(jt)[0]
    m = lh.metric(p, t)
    for a, b in zip(jax.tree_util.tree_leaves(m), jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9, err_msg=name)


def test_amend_energy_and_metric(rng, key):
    data = jnp.asarray(rng.normal(size=(8,)))
    lh0 = jft.Gaussian(data)
    fwd = jft.Model(
        lambda x: jnp.tanh(x["xi"]) * 2.0,
        domain={"xi": jft.ShapeWithDtype((8,))},
    )
    lh = lh0.amend(fwd)
    p = {"xi": jnp.asarray(rng.normal(size=(8,)))}
    np.testing.assert_allclose(float(lh(p)), float(lh0(fwd(p))))

    # composed metric == J_f^T M J_f
    t = {"xi": jnp.asarray(rng.normal(size=(8,)))}
    _, jf = jax.jvp(fwd, (p,), (t,))
    _, vjp = jax.vjp(fwd, p)
    expected = vjp(lh0.metric(fwd(p), jf))[0]
    got = lh.metric(p, t)
    np.testing.assert_allclose(got["xi"], expected["xi"], rtol=1e-10)

    # gradient of energy consistent
    g = jax.grad(lh)(p)
    g0 = jax.grad(lambda q: lh0(fwd(q)))(p)
    np.testing.assert_allclose(g["xi"], g0["xi"], rtol=1e-10)


def test_likelihood_sum(rng, key):
    d1 = jnp.asarray(rng.normal(size=(5,)))
    d2 = jnp.asarray(rng.normal(size=(3,)))
    f1 = jft.Model(lambda x: x["a"], domain={"a": jft.ShapeWithDtype((5,))})
    f2 = jft.Model(lambda x: x["b"] ** 2 + 1.0,
                   domain={"b": jft.ShapeWithDtype((3,))})
    lh = jft.Gaussian(d1).amend(f1) + jft.Gaussian(d2).amend(f2)
    p = {"a": jnp.asarray(rng.normal(size=(5,))),
         "b": jnp.asarray(rng.normal(size=(3,)))}
    e = float(lh(p))
    e_expected = float(jft.Gaussian(d1)(p["a"])) + \
        float(jft.Gaussian(d2)(p["b"] ** 2 + 1.0))
    np.testing.assert_allclose(e, e_expected, rtol=1e-12)

    # metric/lsm/rsm consistency on the sum
    t = {"a": jnp.ones(5), "b": jnp.ones(3)}
    m1 = lh.metric(p, t)
    m2 = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
    np.testing.assert_allclose(m1["a"], m2["a"], rtol=1e-9)
    np.testing.assert_allclose(m1["b"], m2["b"], rtol=1e-9)


def test_freeze_point_estimates(rng, key):
    data = jnp.asarray(rng.normal(size=(4,)))
    fwd = jft.Model(
        lambda x: x["a"] * jnp.exp(0.1 * x["b"]),
        domain={"a": jft.ShapeWithDtype((4,)), "b": jft.ShapeWithDtype(())},
    )
    lh = jft.Gaussian(data).amend(fwd)
    p = {"a": jnp.asarray(rng.normal(size=(4,))), "b": jnp.asarray(0.3)}
    lh_p, liquid = lh.freeze(primals=p, point_estimates=("b",))
    np.testing.assert_allclose(float(lh_p(liquid)), float(lh(p)), rtol=1e-12)

    # gradient w.r.t. liquid subset matches full gradient restricted
    g_full = jax.grad(lh)(p)
    g_liquid = jax.grad(lh_p)(liquid)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(g_liquid)[0], g_full["a"], rtol=1e-10
    )


def test_normalized_residual_gaussian(rng):
    data = jnp.asarray(rng.normal(size=(6,)))
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: 4.0 * x)
    p = jnp.zeros(6)
    np.testing.assert_allclose(lh.normalized_residual(p), 2.0 * data, rtol=1e-12)


def test_bernoulli_likelihood_calculus(rng):
    d = jnp.asarray(rng.integers(0, 2, (12,)))
    lh = jft.Bernoulli(d)
    p = jnp.asarray(rng.uniform(0.1, 0.9, (12,)))
    t = jnp.asarray(rng.standard_normal(12))
    m1 = lh.metric(p, t)
    m2 = lh.left_sqrt_metric(p, lh.right_sqrt_metric(p, t))
    np.testing.assert_allclose(m2, m1, rtol=1e-12)
    _, jt = jax.jvp(lh.transformation, (p,), (t,))
    _, vjp = jax.vjp(lh.transformation, p)
    np.testing.assert_allclose(vjp(jt)[0], m1, rtol=1e-12)
    e2 = -jnp.sum(d * jnp.log(p) + (1 - d) * jnp.log(1 - p))
    np.testing.assert_allclose(lh.energy(p), e2, rtol=1e-13)


def test_inverse_gamma_likelihood_calculus(rng):
    b = jnp.asarray(rng.uniform(0.5, 2.0, (12,)))
    lh = jft.InverseGamma(b, alpha=1.5)
    x = jnp.asarray(rng.uniform(0.5, 2.0, (12,)))
    t = jnp.asarray(rng.standard_normal(12))
    m1 = lh.metric(x, t)
    m2 = lh.left_sqrt_metric(x, lh.right_sqrt_metric(x, t))
    np.testing.assert_allclose(m2, m1, rtol=1e-12)
    _, jt = jax.jvp(lh.transformation, (x,), (t,))
    _, vjp = jax.vjp(lh.transformation, x)
    np.testing.assert_allclose(vjp(jt)[0], m1, rtol=1e-12)
    e2 = jnp.sum(2.5 * jnp.log(x) + b / x)
    np.testing.assert_allclose(lh.energy(x), e2, rtol=1e-13)
