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
