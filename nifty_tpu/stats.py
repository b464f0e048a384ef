"""Standard-normal → target-distribution transforms.

Every latent parameter is a priori standard normal (the framework's
standardized latent space); these transforms push it to the desired
marginal.  Inverse-gamma (no closed-form ppf chain) is tabulated on the
host once and applied as a device-side linear interpolation in log space.

Parity: reference ``src/re/num/stats_distributions.py`` (``normal_prior``
``:41``, ``lognormal_prior`` ``:75``, ``uniform_prior`` ``:110``,
``laplace_prior`` ``:26``, ``invgamma_prior`` ``:209``, ``interpolator``
``:129``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
from jax import numpy as jnp
from jax.scipy.stats import norm as jnorm
from jax.tree_util import Partial, tree_map


# -- normal ----------------------------------------------------------------

def _standard_to_normal(xi, *, mean, std):
    return mean + std * xi


def normal_prior(mean, std) -> Partial:
    return Partial(_standard_to_normal, mean=mean, std=std)


def _normal_to_standard(y, *, mean, std):
    return (y - mean) / std


def normal_invprior(mean, std) -> Partial:
    return Partial(_normal_to_standard, mean=mean, std=std)


# -- log-normal ------------------------------------------------------------

def lognormal_moments(mean, std):
    """Log-space cumulants matching the given linear-space mean/std."""
    mean, std = np.asarray(mean), np.asarray(std)
    if np.any(mean <= 0.0):
        raise ValueError(f"`mean` must be greater zero; got {mean!r}")
    if np.any(std <= 0.0):
        raise ValueError(f"`std` must be greater zero; got {std!r}")
    logstd = np.sqrt(np.log1p((std / mean) ** 2))
    logmean = np.log(mean) - 0.5 * logstd ** 2
    return logmean, logstd


def _standard_to_lognormal(xi, *, log_mean, log_std):
    return jnp.exp(log_mean + log_std * xi)


def lognormal_prior(mean, std, *, _log_mean=None, _log_std=None) -> Partial:
    if _log_mean is None and _log_std is None:
        _log_mean, _log_std = lognormal_moments(mean, std)
    return Partial(_standard_to_lognormal, log_mean=_log_mean, log_std=_log_std)


def _lognormal_to_standard(y, *, log_mean, log_std):
    return (jnp.log(y) - log_mean) / log_std


def lognormal_invprior(mean, std, *, _log_mean=None, _log_std=None) -> Partial:
    if _log_mean is None and _log_std is None:
        _log_mean, _log_std = lognormal_moments(mean, std)
    return Partial(_lognormal_to_standard, log_mean=_log_mean, log_std=_log_std)


# -- laplace ---------------------------------------------------------------

def _standard_to_laplace(xi, *, alpha):
    # Signed log-cdf construction; exact and overflow-safe in both tails.
    res = jnp.where(
        xi < 0,
        jnorm.logcdf(xi) + jnp.log(2.0),
        -(jnorm.logcdf(-xi) + jnp.log(2.0)),
    )
    return res * alpha


def laplace_prior(alpha) -> Partial:
    """P(x|a) = exp(-|x|/a) / (2a)."""
    return Partial(_standard_to_laplace, alpha=alpha)


# -- uniform ---------------------------------------------------------------

def _standard_to_uniform(xi, *, a_min, scale):
    return a_min + scale * jnorm.cdf(xi)


def uniform_prior(a_min=0.0, a_max=1.0) -> Partial:
    if isinstance(a_min, float) and isinstance(a_max, float) \
            and a_min == 0.0 and a_max == 1.0:
        return Partial(partial(tree_map, jnorm.cdf))
    return Partial(_standard_to_uniform, a_min=a_min, scale=a_max - a_min)


# -- interpolation machinery ----------------------------------------------

def interpolator(
    func: Callable,
    xmin: float,
    xmax: float,
    *,
    step: Optional[float] = None,
    num: Optional[int] = None,
    table_func: Optional[Callable] = None,
    inv_table_func: Optional[Callable] = None,
    return_inverse: bool = False,
):
    """Tabulate ``func`` on the host; return a device-side linear interp."""
    if (step is None) == (num is None):
        raise ValueError("exactly one of `step` or `num` must be specified")
    if step is not None:
        xs = np.arange(xmin, xmax + step, step)
    else:
        xs = np.linspace(xmin, xmax, num)

    ys = func(xs)
    if table_func is not None:
        if inv_table_func is None:
            raise ValueError("no `inv_table_func` specified")
        ys = np.asarray(table_func(ys))

    xs_j, ys_j = jnp.asarray(xs), jnp.asarray(ys)

    def interp(x):
        res = jnp.interp(x, xs_j, ys_j)
        if inv_table_func is not None:
            res = inv_table_func(res)
        return res

    if return_inverse:
        def inverse_interp(y):
            if table_func is not None:
                y = table_func(y)
            return jnp.interp(y, ys_j, xs_j)

        return interp, inverse_interp
    return interp


# -- inverse gamma ---------------------------------------------------------

def invgamma_prior(a, scale, loc=0.0, step=1e-2) -> Callable:
    """Standard normal → inverse gamma via tabulated ppf∘cdf (log-space
    interpolation); ``scale`` may be array-like when ``loc == 0``."""
    from scipy.stats import invgamma, norm as snorm

    if np.ndim(a) != 0 or np.ndim(loc) != 0:
        raise TypeError("shape `a` and location `loc` must be scalar")
    if loc == 0.0:
        s2i = lambda x: invgamma.ppf(snorm.cdf(x), a=a)
    elif np.ndim(scale) == 0:
        s2i = lambda x: invgamma.ppf(snorm.cdf(x), a=a, loc=loc, scale=scale)
    else:
        raise TypeError("`scale` may only be array-like for `loc == 0.`")

    xmin, xmax = -8.2, 8.2  # (1 - Phi(8.2)) * 2 < 1e-15
    interp = interpolator(
        s2i, xmin, xmax, step=step, table_func=jnp.log, inv_table_func=jnp.exp
    )

    def standard_to_invgamma(x):
        if loc == 0.0:
            return interp(x) * scale
        return interp(x)

    return standard_to_invgamma


def invgamma_invprior(a, scale, loc=0.0, step=1e-2) -> Callable:
    """Inverse transform of :func:`invgamma_prior`."""
    from scipy.stats import invgamma, norm as snorm

    if loc == 0.0:
        s2i = lambda x: invgamma.ppf(snorm.cdf(x), a=a)
    else:
        s2i = lambda x: invgamma.ppf(snorm.cdf(x), a=a, loc=loc, scale=scale)
    _, inv = interpolator(
        s2i, -8.2, 8.2, step=step, table_func=jnp.log,
        inv_table_func=jnp.exp, return_inverse=True,
    )

    def invgamma_to_standard(y):
        if loc == 0.0:
            y = y / scale
        return inv(y)

    return invgamma_to_standard


# -- gamma / log-inverse-gamma --------------------------------------------

def gamma_prior(a, scale=1.0, loc=0.0, step=1e-2) -> Callable:
    """Standard normal → Gamma(a, scale) via tabulated ppf∘cdf.

    Parity: classic ``GammaOperator`` (``src/library/
    special_distributions.py:216``).
    """
    from scipy.stats import gamma, norm as snorm

    if np.ndim(a) != 0 or np.ndim(loc) != 0:
        raise TypeError("shape `a` and location `loc` must be scalar")
    if loc == 0.0:
        s2g = lambda x: gamma.ppf(snorm.cdf(x), a=a)
    elif np.ndim(scale) == 0:
        s2g = lambda x: gamma.ppf(snorm.cdf(x), a=a, loc=loc, scale=scale)
    else:
        raise TypeError("`scale` may only be array-like for `loc == 0.`")
    interp = interpolator(
        s2g, -8.2, 8.2, step=step, table_func=jnp.log, inv_table_func=jnp.exp
    )

    def standard_to_gamma(x):
        if loc == 0.0:
            return interp(x) * scale
        return interp(x)

    return standard_to_gamma


def log_invgamma_prior(a, scale, loc=0.0, step=1e-2) -> Callable:
    """Standard normal → log of an inverse-gamma variable.

    Parity: classic ``LogInverseGammaOperator``
    (``src/library/special_distributions.py:305``).
    """
    from scipy.stats import invgamma, norm as snorm

    s2l = lambda x: np.log(invgamma.ppf(snorm.cdf(x), a=a, loc=loc,
                                        scale=1.0))
    interp = interpolator(s2l, -8.2, 8.2, step=step)

    def standard_to_log_invgamma(x):
        return interp(x) + jnp.log(scale)

    return standard_to_log_invgamma
