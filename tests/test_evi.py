"""Sampling-engine tests (ref model: ``test/test_re/test_evi.py``).

On a *linear* Gaussian model the posterior is analytic: the MGVI residual
samples must follow N(0, (M+1)^{-1}) and the KL optimum is the Wiener
filter solution.
"""

import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft
from nifty_tpu.evi import Samples, draw_linear_residual


def _linear_setup(rng, n=8, m=12, noise_std=0.3):
    R = rng.normal(size=(m, n))
    truth = rng.normal(size=n)
    data = R @ truth + noise_std * rng.normal(size=m)
    lh = jft.Gaussian(
        jnp.asarray(data), noise_cov_inv=lambda x: x / noise_std ** 2
    ).amend(
        jft.Model(lambda p: jnp.asarray(R) @ p["x"],
                  domain={"x": jft.ShapeWithDtype((n,))})
    )
    M = R.T @ R / noise_std ** 2  # likelihood metric in latent space
    post_cov = np.linalg.inv(M + np.eye(n))
    post_mean = post_cov @ (R.T @ data / noise_std ** 2)
    return lh, post_mean, post_cov


def test_linear_residual_covariance(rng, key):
    lh, _, post_cov = _linear_setup(rng)
    pos = {"x": jnp.zeros(post_cov.shape[0])}
    n_samples = 600
    keys = jax.random.split(key, n_samples)
    draw = jax.jit(jax.vmap(
        lambda k: draw_linear_residual(
            lh, pos, k, cg_kwargs=dict(resnorm=1e-10, maxiter=200)
        )[0]["x"]
    ))
    smpls = np.asarray(draw(keys))
    emp_cov = smpls.T @ smpls / n_samples
    # MC error ~ 1/sqrt(600) on O(1) entries
    np.testing.assert_allclose(emp_cov, post_cov, atol=0.15)


def test_linear_residual_mean_zero(rng, key):
    lh, _, _ = _linear_setup(rng)
    pos = {"x": jnp.zeros(8)}
    keys = jax.random.split(key, 400)
    draw = jax.jit(jax.vmap(
        lambda k: draw_linear_residual(
            lh, pos, k, cg_kwargs=dict(resnorm=1e-10, maxiter=200)
        )[0]["x"]
    ))
    smpls = np.asarray(draw(keys))
    assert np.max(np.abs(smpls.mean(0))) < 0.15


def test_optimize_kl_linear_gaussian_is_wiener_filter(rng, key):
    lh, post_mean, _ = _linear_setup(rng)
    k_i, k_o = jax.random.split(key)
    init = jft.random_like(k_i, lh.domain)
    samples, state = jft.optimize_kl(
        lh, init, key=k_o, n_total_iterations=4, n_samples=3,
        draw_linear_kwargs=dict(cg_kwargs=dict(resnorm=1e-11, maxiter=200)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-13, maxiter=50)),
        sample_mode="linear_resample",
    )
    # With a linear model the KL optimum equals the exact posterior mean.
    np.testing.assert_allclose(samples.pos["x"], post_mean, rtol=1e-4,
                               atol=1e-5)


def test_point_estimates_freeze_residual(rng, key):
    lh, _, _ = _linear_setup(rng)
    fwd2 = jft.Model(
        lambda p: p["x"] + 0.0 * p["c"],
        domain={"x": jft.ShapeWithDtype((8,)), "c": jft.ShapeWithDtype(())},
    )
    data = jnp.asarray(rng.normal(size=8))
    lh2 = jft.Gaussian(data).amend(fwd2)
    pos = {"x": jnp.zeros(8), "c": jnp.asarray(0.5)}
    smpl, _ = draw_linear_residual(
        lh2, pos, key, point_estimates=("c",),
        cg_kwargs=dict(resnorm=1e-9, maxiter=100),
    )
    assert float(smpl["c"]) == 0.0
    assert np.any(np.asarray(smpl["x"]) != 0.0)


def test_nonlinear_update_noop_for_linear_model(rng, key):
    """geoVI curving must (nearly) fix the sample for a linear model."""
    lh, _, _ = _linear_setup(rng)
    pos = {"x": 0.1 * jnp.ones(8)}
    resid, _ = draw_linear_residual(
        lh, pos, key, cg_kwargs=dict(resnorm=1e-12, maxiter=300)
    )
    curved, opt_state = jft.nonlinearly_update_residual(
        lh, pos, resid, metric_sample_key=key, metric_sample_sign=1.0,
        minimize_kwargs=dict(xtol=1e-8, maxiter=10),
    )
    np.testing.assert_allclose(curved["x"], resid["x"], atol=1e-5)


def test_samples_container(rng, key):
    pos = {"x": jnp.asarray(rng.normal(size=4))}
    resid = {"x": jnp.asarray(rng.normal(size=(6, 4)))}
    s = Samples(pos=pos, samples=resid, keys=None)
    assert len(s) == 6
    np.testing.assert_allclose(s[2]["x"], pos["x"] + resid["x"][2])
    new_pos = {"x": jnp.zeros(4)}
    s2 = s.at(new_pos)
    np.testing.assert_allclose(s2[0]["x"], resid["x"][0])
    # pytree round trip
    leaves, treedef = jax.tree_util.tree_flatten(s)
    s3 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(s3[1]["x"], s[1]["x"])


def test_napprox_preconditioner_reduces_cg_work(rng, key):
    """`napprox` builds an approximation2endo diagonal preconditioner for
    the draw-CG; on an ill-conditioned (strongly varying noise) metric a
    CG budget that is too small without it suffices with it.

    Parity: classic `napprox` (src/minimization/kl_energies.py:126,
    src/probing.py:142)."""
    n = 256
    # Diagonal likelihood metric spanning 6 orders of magnitude.
    w = jnp.asarray(np.geomspace(1e-2, 1e4, n))
    lh = jft.Gaussian(
        jnp.zeros(n), noise_cov_inv=lambda x: x * w
    ).amend(
        jft.Model(lambda p: p["x"], domain={"x": jft.ShapeWithDtype((n,))})
    )
    pos = {"x": jnp.zeros(n)}
    budget = dict(resnorm=1e-6, maxiter=30, miniter=1)
    _, info_plain = draw_linear_residual(lh, pos, key, cg_kwargs=dict(budget))
    _, info_pre = draw_linear_residual(
        lh, pos, key, napprox=16, cg_kwargs=dict(budget)
    )
    assert int(info_plain) > 0  # hit the iteration cap unpreconditioned
    assert int(info_pre) == 0  # converged within the same budget

    # The preconditioner must not change the solution (solve to high
    # accuracy both ways and compare).
    tight = dict(resnorm=1e-11, maxiter=1000)
    s_plain, _ = draw_linear_residual(lh, pos, key, cg_kwargs=dict(tight))
    s_pre, _ = draw_linear_residual(
        lh, pos, key, napprox=16, cg_kwargs=dict(tight)
    )
    np.testing.assert_allclose(s_pre["x"], s_plain["x"], rtol=2e-4, atol=2e-6)
