"""Prior model wrappers: named latent inputs with distribution transforms.

Parity: reference ``src/re/prior.py:25-115`` — each class is a
:class:`~nifty_tpu.model.WrappedCall` selecting its named latent and
applying the matching transform from :mod:`nifty_tpu.stats`.
"""

from __future__ import annotations

from .model import WrappedCall
from .stats import (
    invgamma_prior,
    laplace_prior,
    lognormal_prior,
    normal_prior,
    uniform_prior,
)


class NormalPrior(WrappedCall):
    """Standard normal → N(mean, std)."""

    def __init__(self, mean, std, **kwargs):
        self.mean = mean
        self.std = std
        super().__init__(normal_prior(mean, std), white_init=True, **kwargs)


class LogNormalPrior(WrappedCall):
    """Standard normal → log-normal with linear-space moments (mean, std)."""

    def __init__(self, mean, std, **kwargs):
        self.mean = mean
        self.std = std
        super().__init__(lognormal_prior(mean, std), white_init=True, **kwargs)


class UniformPrior(WrappedCall):
    """Standard normal → Uniform[a_min, a_max]."""

    def __init__(self, a_min, a_max, **kwargs):
        self.low = self.a_min = a_min
        self.high = self.a_max = a_max
        super().__init__(uniform_prior(a_min, a_max), white_init=True, **kwargs)


class LaplacePrior(WrappedCall):
    """Standard normal → Laplace(scale=alpha)."""

    def __init__(self, alpha, **kwargs):
        self.alpha = alpha
        super().__init__(laplace_prior(alpha), white_init=True, **kwargs)


class InvGammaPrior(WrappedCall):
    """Standard normal → inverse gamma (tabulated transform)."""

    def __init__(self, a, scale, loc=0.0, step=1e-2, **kwargs):
        self.a = a
        self.scale = scale
        self.loc = loc
        self.step = step
        super().__init__(
            invgamma_prior(a, scale, loc, step), white_init=True, **kwargs
        )


class GammaPrior(WrappedCall):
    """Standard normal → Gamma (tabulated transform)."""

    def __init__(self, a, scale=1.0, loc=0.0, step=1e-2, **kwargs):
        from .stats import gamma_prior

        self.a, self.scale, self.loc = a, scale, loc
        super().__init__(
            gamma_prior(a, scale, loc, step), white_init=True, **kwargs
        )


class LogInvGammaPrior(WrappedCall):
    """Standard normal → log inverse gamma (tabulated transform)."""

    def __init__(self, a, scale, loc=0.0, step=1e-2, **kwargs):
        from .stats import log_invgamma_prior

        self.a, self.scale, self.loc = a, scale, loc
        super().__init__(
            log_invgamma_prior(a, scale, loc, step), white_init=True, **kwargs
        )
