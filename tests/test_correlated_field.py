"""Correlated field parity tests against the reference NIFTy.re.

Mirrors the reference's cross-stack equivalence strategy
(``test/test_re/test_correlated_field.py``): identical latent inputs must
produce outputs matching to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from jax import random
from tests.conftest import load_reference_re

pmp = pytest.mark.parametrize


def _build_pair(jref, cf_kwargs, offset_mean=0.2, offset_std=(1e-1, 3e-2),
                matern=False):
    ms = []
    for mod in (jref, jft):
        cfm = mod.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=offset_mean,
                                       offset_std=offset_std)
        if matern:
            cfm.add_fluctuations_matern(**cf_kwargs)
        else:
            cfm.add_fluctuations(**cf_kwargs)
        ms.append((cfm, cfm.finalize()))
    return ms


@pmp("shape,distances", [((16,), 1.0 / 16), ((8, 8), 0.25), ((4, 4, 4), 1.0)])
@pmp("flex", [None, (1.0, 0.5)])
def test_cf_matches_reference(shape, distances, flex, key):
    jref = load_reference_re()
    if jref is None:
        pytest.skip("reference NIFTy.re unavailable")
    kwargs = dict(
        shape=shape, distances=distances, fluctuations=(1.0, 0.5),
        loglogavgslope=(-2.0, 0.5), flexibility=flex,
        asperity=(0.2, 2e-2) if flex is not None else None,
    )
    (cfm_r, cf_r), (cfm_m, cf_m) = _build_pair(jref, kwargs)
    assert {k: tuple(v.shape) for k, v in cf_r.domain.items()} == \
        {k: tuple(v.shape) for k, v in cf_m.domain.items()}
    p = cf_m.init(key)
    np.testing.assert_allclose(cf_r(p), cf_m(p), rtol=1e-11, atol=1e-11)
    np.testing.assert_allclose(
        cfm_r.amplitude(p), cfm_m.amplitude(p), rtol=1e-11, atol=1e-11
    )
    np.testing.assert_allclose(
        cfm_r.power_spectrum(p), cfm_m.power_spectrum(p), rtol=1e-10, atol=1e-11
    )


def test_cf_matern_matches_reference(key):
    jref = load_reference_re()
    if jref is None:
        pytest.skip("reference NIFTy.re unavailable")
    kwargs = dict(
        shape=(16, 16), distances=1.0 / 16, scale=(1.0, 0.5),
        cutoff=(1.0, 1.0), loglogslope=(-4.0, 0.5),
        renormalize_amplitude=False,
    )
    (_, cf_r), (_, cf_m) = _build_pair(jref, kwargs, matern=True)
    p = cf_m.init(key)
    np.testing.assert_allclose(cf_r(p), cf_m(p), rtol=1e-11, atol=1e-11)


def test_cf_multi_subdomain_matches_reference(key):
    jref = load_reference_re()
    if jref is None:
        pytest.skip("reference NIFTy.re unavailable")
    ms = []
    for mod in (jref, jft):
        cfm = mod.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
        cfm.add_fluctuations((8,), 0.5, (1.0, 0.5), (-2.0, 0.5),
                             prefix="ax1")
        cfm.add_fluctuations((6,), 1.0, (2.0, 0.5), (-3.0, 0.5),
                             prefix="ax2")
        ms.append(cfm.finalize())
    cf_r, cf_m = ms
    p = cf_m.init(key)
    assert cf_m(p).shape == (8, 6)
    np.testing.assert_allclose(cf_r(p), cf_m(p), rtol=1e-11, atol=1e-11)


def test_cf_jacobian_matches_reference(key):
    jref = load_reference_re()
    if jref is None:
        pytest.skip("reference NIFTy.re unavailable")
    kwargs = dict(shape=(8, 8), distances=0.125, fluctuations=(1.0, 0.5),
                  loglogavgslope=(-2.0, 0.5), flexibility=(1.0, 0.5),
                  asperity=(0.2, 2e-2))
    (_, cf_r), (_, cf_m) = _build_pair(jref, kwargs)
    p = cf_m.init(key)
    t = jft.random_like(jax.random.PRNGKey(7), cf_m.domain)
    _, jr = jax.jvp(cf_r, (p,), (t,))
    _, jm = jax.jvp(cf_m, (p,), (t,))
    np.testing.assert_allclose(jr, jm, rtol=1e-10, atol=1e-10)


def test_gauss_markov_match_reference(key):
    jref = load_reference_re()
    if jref is None:
        pytest.skip("reference NIFTy.re unavailable")
    import nifty_tpu.models.gauss_markov as gm

    rng = np.random.default_rng(3)
    n = 11
    xi1 = jnp.asarray(rng.normal(size=n))
    dt = jnp.asarray(rng.uniform(0.1, 1.0, size=n))
    np.testing.assert_allclose(
        jref.gauss_markov.wiener_process(xi1, 0.3, 1.7, dt),
        gm.wiener_process(xi1, 0.3, 1.7, dt), rtol=1e-12,
    )
    xi2 = jnp.asarray(rng.normal(size=(n, 2)))
    for asp in (None, 0.3):
        np.testing.assert_allclose(
            jref.gauss_markov.integrated_wiener_process(
                xi2, jnp.array([0.1, -0.2]), 1.3, dt, asp
            ),
            gm.integrated_wiener_process(
                xi2, jnp.array([0.1, -0.2]), 1.3, dt, asp
            ),
            rtol=1e-12,
        )
    np.testing.assert_allclose(
        jref.gauss_markov.ornstein_uhlenbeck_process(xi1, 0.4, 1.2, 0.7, dt),
        gm.ornstein_uhlenbeck_process(xi1, 0.4, 1.2, 0.7, dt), rtol=1e-10,
    )


def test_prior_transforms_match_reference(key):
    jref = load_reference_re()
    if jref is None:
        pytest.skip("reference NIFTy.re unavailable")
    import nifty_tpu.stats as stats

    x = jnp.linspace(-5, 5, 101)
    np.testing.assert_allclose(
        jref.lognormal_prior(2.0, 0.5)(x), stats.lognormal_prior(2.0, 0.5)(x),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        jref.uniform_prior(-1.0, 3.0)(x), stats.uniform_prior(-1.0, 3.0)(x),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        jref.laplace_prior(1.3)(x), stats.laplace_prior(1.3)(x),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        jref.invgamma_prior(3.0, 2.0)(x), stats.invgamma_prior(3.0, 2.0)(x),
        rtol=1e-6,
    )


def test_log_binned_power_spectrum():
    """`n_bins` log-binning: conserved mode counts, matching statistics."""
    from nifty_tpu.models.correlated_field import make_grid

    g = make_grid((64, 64), 1.0 / 64, n_bins=64)
    hg = g.harmonic_grid
    assert hg.mode_lengths.size <= 64
    assert int(np.sum(hg.mode_multiplicity)) == 64 * 64
    assert np.all(np.diff(hg.mode_lengths) > 0)
    assert hg.power_distributor.max() == hg.mode_lengths.size - 1
    assert hg.power_distributor.min() == 0

    def build(n_bins):
        cfm = jft.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 1e-2))
        cfm.add_fluctuations(
            (64, 64), 1.0 / 64, fluctuations=(1.0, 0.5),
            loglogavgslope=(-3.0, 0.5), flexibility=(1.0, 0.5), n_bins=n_bins,
        )
        return cfm.finalize()

    cf, cf_full = build(64), build(None)
    key = random.PRNGKey(42)
    stds, stds_full = [], []
    for _ in range(20):
        key, k = random.split(key)
        stds.append(float(jnp.std(cf(cf.init(k)))))
        stds_full.append(float(jnp.std(cf_full(cf_full.init(k)))))
    assert abs(np.mean(stds) - np.mean(stds_full)) < 0.3 * np.mean(stds_full)
    # binned latent is strictly smaller and the gradient is finite
    p = cf.init(key)
    g = jax.grad(lambda q: jnp.sum(cf(q) ** 2))(p)
    assert all(np.all(np.isfinite(v)) for v in jax.tree_util.tree_leaves(g))


def test_quarter_grid_distribution_bitwise(key):
    """The folded (quarter-grid) power distribution + mirror expansion is
    bitwise identical to the full-grid gather, for forward and gradient,
    binned and unbinned, odd and even axes."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    saved = jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES

    def build(n_bins):
        cfm = jft.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
        kw = {} if n_bins is None else dict(n_bins=n_bins)
        cfm.add_fluctuations(
            (17, 16), distances=1 / 16, fluctuations=(1.0, 0.5),
            loglogavgslope=(-3.0, 0.2), flexibility=(1.0, 0.5),
            asperity=(0.5, 0.05), **kw,
        )
        return cfm.finalize()

    try:
        for n_bins in (None, 8):
            jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES = 0  # force quarter
            cfq = build(n_bins)
            jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES = 1 << 60  # force full
            cff = build(n_bins)
            x = cff.init(key)
            np.testing.assert_array_equal(
                np.asarray(cfq(x)), np.asarray(cff(x))
            )
            # Gradients: the adjoint accumulates mirror contributions in a
            # different association (slice+add fold vs scatter order) — at
            # most a few ulp apart, not bitwise.
            gq = jax.grad(lambda p: jnp.sum(cfq(p) ** 2))(x)
            gf = jax.grad(lambda p: jnp.sum(cff(p) ** 2))(x)
            for a, b in zip(jax.tree_util.tree_leaves(gq),
                            jax.tree_util.tree_leaves(gf)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-13, atol=1e-13
                )
    finally:
        jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES = saved


def test_quarter_index_factorizes_full_map():
    """idx_full == idx_q[fold(i0), fold(i1)] exactly (the identity the
    mirror expansion relies on), odd and even axes."""
    import numpy as np
    from nifty_tpu.models.correlated_field import make_grid

    for shape in ((12, 15), (9, 9), (16,)):
        hg = make_grid(shape, 0.1).harmonic_grid
        idx_full = np.asarray(hg.power_distributor)
        idx_q = np.asarray(hg.power_distributor_quarter)
        folds = [np.minimum(np.arange(n), n - np.arange(n)) for n in shape]
        expanded = idx_q[np.ix_(*folds)]
        np.testing.assert_array_equal(idx_full, expanded)


def test_distributor_routing_by_scale(key):
    """Routing decisions: small grids keep static distributor constants
    (Pallas/MXU-kernel eligible, no consts leaves); grids whose index map
    exceeds RUNTIME_DIST_MIN_BYTES carry it as a dynamic `consts` leaf on
    the quarter grid."""
    import numpy as np

    def build(shape):
        cfm = jft.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
        cfm.add_fluctuations(shape, distances=1.0 / shape[0],
                             fluctuations=(1.0, 0.5),
                             loglogavgslope=(-3.0, 0.2))
        return cfm.finalize()

    small = build((32, 32))
    assert small.consts is None  # static path

    saved = jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES
    try:
        # lower the gate so a test-sized grid takes the at-scale route
        jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES = 1024
        big = build((64, 64))
    finally:
        jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES = saved
    assert big.consts is not None
    dist = big.consts["power_distributor_0"]
    # quarter grid: axis lengths n//2+1
    assert dist.shape == (33, 33)
    # sorted-adjoint auxiliaries ride alongside the index map (round 5)
    assert big.consts["pd_perm_0"].shape == (dist.size,)
    assert big.consts["pd_sorted_0"].shape == (dist.size,)
    # OptimizeVI stage binding follows the same scale split
    import jax.numpy as jnp

    lh = jft.Gaussian(jnp.zeros((64, 64)), noise_cov_inv=lambda x: x).amend(big)
    opt_small = jft.OptimizeVI(
        jft.Gaussian(jnp.zeros((32, 32)), noise_cov_inv=lambda x: x).amend(small),
        n_total_iterations=1)
    assert not opt_small._lh_as_arg
    saved2 = jft.OptimizeVI.LH_AS_ARG_MIN_BYTES
    try:
        jft.OptimizeVI.LH_AS_ARG_MIN_BYTES = 1024
        opt_big = jft.OptimizeVI(lh, n_total_iterations=1)
    finally:
        jft.OptimizeVI.LH_AS_ARG_MIN_BYTES = saved2
    assert opt_big._lh_as_arg


def test_transform_compute_dtype_policy():
    """Mixed-precision policy (docs/design.md "Precision policy"): with
    x64 ambient dtype and ``transform_compute_dtype="float32"``, the CF
    output stays f64 (state/nonlinearities/energies keep the ambient
    dtype) while the harmonic transform runs in f32 — outputs must agree
    with the pure-f64 build to f32-rounding level, not bitwise."""
    assert jax.config.jax_enable_x64

    def build():
        cfm = jft.CorrelatedFieldMaker("cf")
        cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
        cfm.add_fluctuations(
            (24, 24), distances=1.0 / 24, fluctuations=(1.0, 5e-1),
            loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
        )
        return cfm.finalize()

    cf = build()
    x = cf.init(jax.random.PRNGKey(2))
    a = jax.jit(cf)(x)
    jft.config.update("transform_compute_dtype", "float32")
    try:
        b = jax.jit(build())(x)
    finally:
        jft.config.update("transform_compute_dtype", None)
    assert a.dtype == jnp.float64 and b.dtype == jnp.float64
    d = float(jnp.abs(a - b).max())
    assert 0.0 < d < 1e-4, d  # f32 transform rounding, not f64-bitwise
    import pytest

    with pytest.raises(ValueError):
        jft.config.update("transform_compute_dtype", "bfloat16")
