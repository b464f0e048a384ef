"""Iterative charted refinement tests (ref model:
``test/test_re/test_refine.py:32-39`` — kernel-matrix consistency against
explicit covariance matrices from scipy ``distance_matrix``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import distance_matrix

from nifty_tpu.refine import (
    CoordinateChart,
    RefinementField,
    coarse_windows,
    refinement_matrices,
)

pmp = pytest.mark.parametrize


def _matern(r):
    return (1.0 + r) * jnp.exp(-r)


def _exact_cov_of_model(rf, chart):
    """Exact covariance implied by the (linear) refinement model."""
    x0 = rf.init(jax.random.PRNGKey(0))
    zeros = jax.tree_util.tree_map(jnp.zeros_like, x0)
    J = jax.jacfwd(rf)(zeros)
    npix = int(np.prod(chart.shapes[-1]))
    A = np.concatenate(
        [np.asarray(J[k]).reshape(npix, -1) for k in sorted(J)], axis=-1
    )
    return A @ A.T


def test_refinement_matrices_are_conditional(rng):
    """olf/ker_sqrt solve the GP conditioning problem exactly."""
    coarse = jnp.asarray(rng.normal(size=(9, 2)))
    fine = jnp.asarray(0.3 * rng.normal(size=(4, 2)))
    olf, ker = refinement_matrices(_matern, coarse, fine)
    cc = np.asarray(_matern(jnp.asarray(distance_matrix(coarse, coarse))))
    fc = np.asarray(_matern(jnp.asarray(distance_matrix(fine, coarse))))
    ff = np.asarray(_matern(jnp.asarray(distance_matrix(fine, fine))))
    np.testing.assert_allclose(np.asarray(olf) @ cc, fc, atol=1e-8)
    cond = ff - fc @ np.linalg.solve(cc, fc.T)
    np.testing.assert_allclose(
        np.asarray(ker) @ np.asarray(ker).T, cond, atol=1e-7
    )


@pmp("ndim", [1, 2])
def test_coarse_windows(rng, ndim):
    shape = (6,) * ndim
    x = jnp.asarray(rng.normal(size=shape))
    w = coarse_windows(x, ndim)
    assert w.shape == tuple(n - 2 for n in shape) + (3 ** ndim,)
    # center entry of the window is the interior pixel itself
    center = 3 ** ndim // 2
    interior = x[(slice(1, -1),) * ndim]
    np.testing.assert_allclose(w[..., center], interior)


@pmp("depth", [1, 2])
def test_refined_covariance_1d(depth):
    chart = CoordinateChart(12, depth=depth, distances0=0.25)
    rf = RefinementField(chart, _matern)
    C = _exact_cov_of_model(rf, chart)
    P = chart.positions(depth).reshape(-1, 1)
    exact = np.asarray(_matern(jnp.asarray(distance_matrix(P, P))))
    assert np.abs(C - exact).max() < 0.02


def test_refined_covariance_2d():
    chart = CoordinateChart((8, 8), depth=1, distances0=0.3)
    rf = RefinementField(chart, _matern)
    C = _exact_cov_of_model(rf, chart)
    P = chart.positions(1).reshape(-1, 2)
    exact = np.asarray(_matern(jnp.asarray(distance_matrix(P, P))))
    assert np.abs(C - exact).max() < 0.05


def test_refined_covariance_deformed_chart():
    chart = CoordinateChart(
        14, depth=2, distances0=0.2,
        nonlinear_map=lambda x: x + 0.05 * x ** 2,
    )
    rf = RefinementField(chart, _matern)
    C = _exact_cov_of_model(rf, chart)
    P = chart.positions(2).reshape(-1, 1)
    exact = np.asarray(_matern(jnp.asarray(distance_matrix(P, P))))
    assert np.abs(C - exact).max() < 0.05


def test_refinement_field_jit_grad(key):
    chart = CoordinateChart((8, 8), depth=2, distances0=0.5)
    rf = RefinementField(chart, _matern)
    x = rf.init(key)
    out = jax.jit(rf)(x)
    assert out.shape == chart.shapes[-1]
    g = jax.grad(lambda p: jnp.sum(rf(p) ** 2))(x)
    assert set(g.keys()) == set(x.keys())


def test_refinement_in_inference(key):
    """ICR field works as a forward model in the VI engine."""
    import nifty_tpu as jft

    chart = CoordinateChart(16, depth=2, distances0=0.3)
    rf = RefinementField(chart, _matern)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    truth = rf(rf.init(k1))
    noise = 0.2
    data = truth + noise * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / noise ** 2).amend(rf)
    samples, _ = jft.optimize_kl(
        lh, jft.random_like(k3, lh.domain), key=k4,
        n_total_iterations=3, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-8, maxiter=40)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-8, maxiter=10)),
        sample_mode="linear_resample",
    )
    pm = jft.mean([rf(s) for s in samples])
    rms = float(jnp.sqrt(jnp.mean((pm - truth) ** 2)))
    assert rms < 3 * noise


def test_healpix_refinement_covariance():
    from nifty_tpu.refine import HEALPixChart, RefinementHPField

    kernel = lambda r: jnp.exp(-(r / 1.0) ** 2 / 2)
    chart = HEALPixChart(4, depth=1)
    rf = RefinementHPField(chart, kernel)
    x = rf.init(jax.random.PRNGKey(0))
    assert jax.jit(rf)(x).shape == chart.shapes[-1]
    zeros = jax.tree_util.tree_map(jnp.zeros_like, x)
    J = jax.jacfwd(rf)(zeros)
    npix = chart.shapes[-1][0]
    A = np.concatenate(
        [np.asarray(J[k]).reshape(npix, -1) for k in sorted(J)], axis=-1
    )
    C = A @ A.T
    P = chart.positions(chart.depth)
    exact = np.asarray(
        kernel(jnp.sqrt(((P[:, None] - P[None, :]) ** 2).sum(-1)))
    )
    assert np.abs(C - exact).max() < 0.02


def test_healpix_radial_refinement():
    from nifty_tpu.refine import CoordinateChart
    from nifty_tpu.refine.healpix_field import HEALPixChart, RefinementHPField

    kernel = lambda r: jnp.exp(-(r / 1.5) ** 2 / 2)
    radial = CoordinateChart(6, depth=1, distances0=0.1,
                             nonlinear_map=lambda x: 1.0 + x)
    chart = HEALPixChart(2, depth=1, radial_chart=radial)
    rf = RefinementHPField(chart, kernel)
    x = rf.init(jax.random.PRNGKey(0))
    out = jax.jit(rf)(x)
    assert out.shape == chart.shapes[-1]
    zeros = jax.tree_util.tree_map(jnp.zeros_like, x)
    J = jax.jacfwd(rf)(zeros)
    npts = int(np.prod(chart.shapes[-1]))
    A = np.concatenate(
        [np.asarray(J[k]).reshape(npts, -1) for k in sorted(J)], axis=-1
    )
    C = A @ A.T
    P = chart.positions(chart.depth).reshape(-1, 3)
    exact = np.asarray(
        kernel(jnp.sqrt(((P[:, None] - P[None, :]) ** 2).sum(-1)))
    )
    assert np.abs(C - exact).max() < 0.05


# -- generalized geometry (arbitrary window/child sizes, jump/extend,
#    irregular per-axis shapes, periodicity, index algebra) ----------------

from nifty_tpu.refine.chart import (
    coarse2fine_distances,
    coarse2fine_shape,
    fine2coarse_distances,
    fine2coarse_shape,
)


@pmp("csz,fsz,strategy", [(3, 2, "jump"), (5, 4, "jump"), (3, 2, "extend"),
                          (5, 4, "extend"), (5, 2, "extend")])
def test_shape_algebra_roundtrip(csz, fsz, strategy):
    """coarse2fine/fine2coarse shape translation matches the reference's
    formulas (src/re/refine/util.py:137-230) and round-trips."""
    from math import ceil

    for n0 in (8, 11, 12, 17):
        shp = coarse2fine_shape(
            (n0,), 2, coarse_size=csz, fine_size=fsz, fine_strategy=strategy
        )
        # one level by hand
        if strategy == "jump":
            n1 = fsz * (n0 - (csz - 1))
            n2 = fsz * (n1 - (csz - 1))
        else:
            n1 = fsz * ceil((n0 - (csz - 1)) / (fsz // 2))
            n2 = fsz * ceil((n1 - (csz - 1)) / (fsz // 2))
        assert shp == (n2,)
        back = fine2coarse_shape(
            shp, 2, coarse_size=csz, fine_size=fsz, fine_strategy=strategy
        )
        assert back[0] <= n0
        again = coarse2fine_shape(
            back, 2, coarse_size=csz, fine_size=fsz, fine_strategy=strategy
        )
        assert again[0] >= shp[0] - fsz  # minimal covering coarse shape


def test_distance_algebra():
    np.testing.assert_allclose(
        coarse2fine_distances(1.0, 3, fine_size=4, fine_strategy="jump"),
        [1.0 / 64],
    )
    np.testing.assert_allclose(
        coarse2fine_distances(1.0, 3, fine_size=4, fine_strategy="extend"),
        [1.0 / 8],
    )
    np.testing.assert_allclose(
        fine2coarse_distances(
            coarse2fine_distances(0.3, 2, fine_size=2), 2, fine_size=2
        ),
        [0.3],
    )


@pmp("csz,fsz,strategy", [(3, 2, "extend"), (3, 4, "jump"), (5, 2, "extend"),
                          (5, 4, "jump"), (5, 4, "extend")])
@pmp("ndim", [1, 2])
def test_refinement_covariance_exact_one_window(csz, fsz, strategy, ndim):
    """With shape0 = coarse_size^d and depth 1 there is exactly one window;
    the implied model covariance must equal the kernel evaluated on the
    fine-pixel distance matrix (parity:
    /root/reference/test/test_re/test_refine.py:202-247)."""
    dist0 = 0.7
    chart = CoordinateChart(
        (csz,) * ndim, depth=1, distances0=dist0, coarse_size=csz,
        fine_size=fsz, fine_strategy=strategy,
    )
    rf = RefinementField(chart, _matern)
    cov = _exact_cov_of_model(rf, chart)

    dvol = dist0 / (fsz if strategy == "jump" else 2)
    idx = np.stack(
        np.meshgrid(*(np.arange(fsz),) * ndim, indexing="ij"), axis=-1
    ).reshape(-1, ndim) * dvol
    cov_truth = np.asarray(_matern(jnp.asarray(distance_matrix(idx, idx))))
    np.testing.assert_allclose(cov, cov_truth, atol=1e-7, rtol=1e-6)


def test_refinement_irregular_axis_shapes():
    """Different extents per axis flow through the shape algebra; clamped
    windows at non-divisible extents keep the model a consistent GP."""
    chart = CoordinateChart(
        (9, 6), depth=2, distances0=(0.5, 0.8), coarse_size=3, fine_size=2,
        fine_strategy="extend",
    )
    rf = RefinementField(chart, _matern)
    x = rf.init(jax.random.PRNGKey(1))
    out = rf(x)
    assert out.shape == chart.shapes[-1]
    assert out.shape[0] != out.shape[1]
    cov = _exact_cov_of_model(rf, chart)
    P = chart.positions(chart.depth).reshape(-1, 2)
    cov_truth = np.asarray(_matern(jnp.asarray(distance_matrix(P, P))))
    scale = cov_truth.ravel().max()
    assert np.abs(cov - cov_truth).max() / scale < 0.11
    # the bulk must be much tighter than the worst boundary site
    med = np.median(np.abs(cov - cov_truth)) / scale
    assert med < 2e-2


def test_refinement_deformed_irregular_chart_covariance():
    """A nonlinearly deformed chart with an irregular extent reproduces the
    kernel on the *deformed* coordinates (the reference's headline ICR
    property, test_refine.py:32-39)."""

    def warp(reg):
        # smooth stretch along axis 0
        r = reg.copy()
        return np.stack(
            [reg[..., 0] + 0.3 * np.sin(reg[..., 0]), reg[..., 1]], axis=-1
        )

    chart = CoordinateChart(
        (8, 7), depth=1, distances0=(0.4, 0.4), nonlinear_map=warp,
    )
    rf = RefinementField(chart, _matern)
    out = rf(rf.init(jax.random.PRNGKey(2)))
    assert out.shape == chart.shapes[-1]
    cov = _exact_cov_of_model(rf, chart)
    P = chart.positions(chart.depth).reshape(-1, 2)
    cov_truth = np.asarray(_matern(jnp.asarray(distance_matrix(P, P))))
    scale = cov_truth.ravel().max()
    assert np.abs(cov - cov_truth).max() / scale < 0.05


def test_refinement_periodic_axis():
    """Periodic axes wrap refinement windows; the field keeps the periodic
    topology (windows gather across the seam) and stays a consistent GP."""
    chart = CoordinateChart(
        (8, 8), depth=1, distances0=0.5, periodic=(True, False),
    )
    assert chart.shapes[1][0] == 16  # no interior shrink on the wrapped axis
    rf = RefinementField(chart, _matern)
    x = rf.init(jax.random.PRNGKey(3))
    out = rf(x)
    assert out.shape == chart.shapes[-1]
    assert np.all(np.isfinite(np.asarray(out)))


def test_matrices_at_matches_direct_conditioning():
    chart = CoordinateChart((6, 6), depth=1, distances0=0.3)
    rf = RefinementField(chart, _matern)
    olf, ker = rf.matrices_at(0, (1, 2))
    cw, fw = rf._site_coords(0, (1, 2))
    olf2, ker2 = refinement_matrices(
        _matern, jnp.asarray(cw), jnp.asarray(fw)
    )
    np.testing.assert_allclose(np.asarray(olf), np.asarray(olf2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ker2), rtol=1e-12)
