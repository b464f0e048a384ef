"""Stats-distribution transforms vs scipy ground truth.

Mirrors the reference's ``test/test_re/test_stats_distributions.py``: each
standard-normal → target-distribution transform must agree with the exact
``ppf(norm.cdf(x))`` mapping, its inverse must round-trip, and pushing a
large standard-normal sample through it must produce the right moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

import nifty_tpu as jft
from nifty_tpu import stats

pmp = pytest.mark.parametrize

XS = np.linspace(-5.0, 5.0, 101)


def test_normal_prior_matches_scipy():
    f = stats.normal_prior(1.5, 0.7)
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(XS))),
        sps.norm.ppf(sps.norm.cdf(XS), loc=1.5, scale=0.7),
        # scipy's ppf∘cdf round-trip itself carries ~1e-11 error in the tails
        rtol=1e-10, atol=1e-10,
    )


def test_normal_invprior_roundtrip():
    f = stats.normal_prior(1.5, 0.7)
    finv = stats.normal_invprior(1.5, 0.7)
    np.testing.assert_allclose(np.asarray(finv(f(jnp.asarray(XS)))), XS,
                               rtol=1e-10, atol=1e-10)


@pmp("mean,std", [(1.0, 0.5), (3.0, 2.0), (0.2, 0.05)])
def test_lognormal_prior_moments(mean, std, key):
    f = stats.lognormal_prior(mean, std)
    xi = jax.random.normal(key, (200_000,))
    y = np.asarray(f(xi))
    assert np.all(y > 0)
    np.testing.assert_allclose(y.mean(), mean, rtol=2e-2)
    np.testing.assert_allclose(y.std(), std, rtol=3e-2)


def test_lognormal_invprior_roundtrip():
    f = stats.lognormal_prior(2.0, 0.5)
    finv = stats.lognormal_invprior(2.0, 0.5)
    np.testing.assert_allclose(np.asarray(finv(f(jnp.asarray(XS)))), XS,
                               rtol=1e-8, atol=1e-8)


def test_uniform_prior_matches_scipy():
    f = stats.uniform_prior(-2.0, 3.0)
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(XS))),
        sps.uniform.ppf(sps.norm.cdf(XS), loc=-2.0, scale=5.0),
        rtol=1e-6, atol=1e-12,
    )
    # the fast path (0, 1) is the plain normal cdf
    f01 = stats.uniform_prior()
    np.testing.assert_allclose(
        np.asarray(f01(jnp.asarray(XS))), sps.norm.cdf(XS), rtol=1e-6
    )


def test_laplace_prior_matches_scipy():
    f = stats.laplace_prior(1.3)
    np.testing.assert_allclose(
        np.asarray(f(jnp.asarray(XS))),
        sps.laplace.ppf(sps.norm.cdf(XS), scale=1.3),
        rtol=1e-5, atol=1e-8,
    )


@pmp("a,scale", [(1.5, 2.0), (3.0, 0.5)])
def test_invgamma_prior_matches_scipy(a, scale):
    f = stats.invgamma_prior(a, scale, step=1e-3)
    want = sps.invgamma.ppf(sps.norm.cdf(XS), a=a, scale=scale)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(XS))), want,
                               rtol=1e-4)


def test_invgamma_prior_array_scale():
    scale = np.array([0.5, 1.0, 2.0])
    f = stats.invgamma_prior(2.0, scale)
    x = jnp.zeros(3)
    want = sps.invgamma.ppf(0.5, a=2.0) * scale
    np.testing.assert_allclose(np.asarray(f(x)), want, rtol=1e-4)


def test_invgamma_invprior_roundtrip():
    f = stats.invgamma_prior(2.0, 1.5, step=1e-3)
    finv = stats.invgamma_invprior(2.0, 1.5, step=1e-3)
    xs = np.linspace(-4, 4, 41)
    np.testing.assert_allclose(np.asarray(finv(f(jnp.asarray(xs)))), xs,
                               rtol=1e-3, atol=1e-3)


@pmp("a,scale", [(2.0, 1.0), (4.0, 3.0)])
def test_gamma_prior_matches_scipy(a, scale):
    f = stats.gamma_prior(a, scale, step=1e-3)
    want = sps.gamma.ppf(sps.norm.cdf(XS), a=a, scale=scale)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(XS))), want,
                               rtol=1e-4)


def test_log_invgamma_prior_matches_scipy():
    f = stats.log_invgamma_prior(2.0, 1.0, step=1e-3)
    want = np.log(sps.invgamma.ppf(sps.norm.cdf(XS), a=2.0, scale=1.0))
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(XS))), want,
                               rtol=1e-4, atol=1e-4)


def test_lognormal_moments_formula():
    m, s = stats.lognormal_moments(3.0, 1.2)
    y = np.random.default_rng(0).normal(m, s, size=1_000_000)
    y = np.exp(y)
    np.testing.assert_allclose(y.mean(), 3.0, rtol=1e-2)
    np.testing.assert_allclose(y.std(), 1.2, rtol=2e-2)


# -- prior Model wrappers ---------------------------------------------------

@pmp("cls,kwargs,dist,dkw", [
    (jft.NormalPrior, dict(mean=0.5, std=2.0), sps.norm,
     dict(loc=0.5, scale=2.0)),
    (jft.LaplacePrior, dict(alpha=1.1), sps.laplace,
     dict(loc=0.0, scale=1.1)),
    (jft.UniformPrior, dict(a_min=0.0, a_max=2.0), sps.uniform,
     dict(loc=0.0, scale=2.0)),
])
def test_prior_models_push_standard_normal(cls, kwargs, dist, dkw, key):
    model = cls(**kwargs, shape=(50_000,))
    y = np.asarray(model(model.init(key)))
    # Kolmogorov-Smirnov against the target distribution
    _, pval = sps.kstest(y, dist.cdf, args=tuple(dkw.values()))
    assert pval > 1e-3


def test_invgamma_prior_model_jittable(key):
    model = jft.InvGammaPrior(a=2.0, scale=1.0, shape=(16,))
    pos = model.init(key)
    out = jax.jit(model)(pos)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out) > 0)
