"""Gauss-Markov processes (Wiener, integrated Wiener, Ornstein-Uhlenbeck).

Realizations are generated from i.i.d. standard-normal increments with
closed-form discrete transition kernels; integration is expressed through
``jnp.cumsum`` (an XLA parallel prefix scan — log-depth on TPU, unlike a
sequential host loop).

Parity: reference ``src/re/gauss_markov.py`` (``wiener_process`` ``:98``,
``integrated_wiener_process`` ``:110``, ``ornstein_uhlenbeck_process``
``:127``, generic ``GaussMarkovProcess`` ``:134``, wrappers ``:181-344``).
Math re-derived from the SDE discretizations.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
from jax import numpy as jnp

from ..model import Initializer, LazyModel, Model
from ..prior import LogNormalPrior, NormalPrior
from ..tree import ShapeWithDtype, random_like


def _isscalar(x):
    return jnp.ndim(x) == 0


def wiener_process(xi, x0, sigma, dt):
    """W_{i+1} = W_i + sigma sqrt(dt) xi_i  (cumulative sum form)."""
    amp = jnp.sqrt(dt) * sigma
    inc = jnp.concatenate([jnp.atleast_1d(x0).ravel(), amp * xi])
    return jnp.cumsum(inc)


def integrated_wiener_process(xi, x0, sigma, dt, asperity=None):
    """Generalized IWP: d/dt x = y + sigma*sqrt(asperity) xi1, d/dt y = sigma xi2.

    ``xi`` has shape (N, 2); returns shape (N+1, 2) with rows (x_i, y_i).
    The exact discrete transition for the pure IWP has per-step covariance
    ``sigma^2 * [[dt^3/3, dt^2/2], [dt^2/2, dt]]``; its Cholesky-like
    square root gives the x-increment ``dt*(y_i + 0.5*dy) + sigma*sqrt(dt)*
    sqrt(dt^2/12 + asperity) * xi1`` used below.
    """
    asp = 0.0 if asperity is None else asperity
    dt = jnp.ones(xi.shape[0]) * dt if _isscalar(dt) else dt
    amp = sigma * jnp.sqrt(dt)
    dy = amp * xi[:, 1]
    y = x0[1] + jnp.cumsum(dy)
    y_prev = jnp.concatenate([x0[1][None] if jnp.ndim(x0[1]) == 0 else
                              jnp.atleast_1d(x0[1]), y[:-1]])
    dx = amp * jnp.sqrt(dt ** 2 / 12.0 + asp) * xi[:, 0] + dt * (y_prev + 0.5 * dy)
    x = x0[0] + jnp.cumsum(dx)
    x_full = jnp.concatenate([jnp.atleast_1d(x0[0]), x])
    y_full = jnp.concatenate([jnp.atleast_1d(x0[1]), y])
    return jnp.stack([x_full, y_full], axis=-1)


def ornstein_uhlenbeck_process(xi, x0, sigma, gamma, dt):
    """OU: exact discrete drift exp(-gamma dt), stationary amplitude."""
    drift = jnp.exp(-gamma * dt)
    amp = sigma * jnp.sqrt(1.0 - drift ** 2)
    if _isscalar(dt):
        n = xi.shape[0]
        drift = drift * jnp.ones(n)
        amp = amp * jnp.ones(n)
    else:
        drift = drift * jnp.ones(xi.shape[0])
        amp = amp * jnp.ones(xi.shape[0])

    # x_{i+1} = drift_i x_i + amp_i xi_i.  Parallel form: divide by the
    # cumulative drift product and cumsum (log-depth on device).
    logc = jnp.cumsum(jnp.log(drift))
    c = jnp.exp(logc)  # prod_{j<=i} drift_j
    scaled = amp * xi / c
    x = c * (x0 + jnp.cumsum(scaled))
    return jnp.concatenate([jnp.atleast_1d(x0), x])


class GaussMarkovProcess(Model):
    """Generic wrapper turning a process generator into a :class:`Model`.

    Parity: ``src/re/gauss_markov.py:134``.
    """

    def __init__(
        self,
        process: Callable,
        x0,
        dt,
        name: str = "xi",
        N_steps: Optional[int] = None,
        **kwargs,
    ):
        if _isscalar(dt):
            if N_steps is None:
                raise ValueError("`N_steps` required when `dt` is scalar")
            dt = np.ones(N_steps) * dt
        shp = jnp.shape(dt) + jnp.shape(
            x0.target if isinstance(x0, LazyModel) else x0
        )
        domain = {name: ShapeWithDtype(shp)}
        init = Initializer(
            {name: partial(random_like, primals=domain[name])}
        )
        if isinstance(x0, LazyModel):
            domain = {**domain, **x0.domain}
            init = init | x0.init
        for a in kwargs.values():
            if isinstance(a, LazyModel):
                domain = {**domain, **a.domain}
                init = init | a.init
        self.x0 = x0
        self.kwargs = kwargs
        self.name = name
        self.process = process
        self.dt = dt
        super().__init__(domain=domain, init=init)

    def __call__(self, x):
        xi = x[self.name]
        x0 = self.x0(x) if isinstance(self.x0, LazyModel) else self.x0
        kw = {
            k: a(x) if isinstance(a, LazyModel) else a
            for k, a in self.kwargs.items()
        }
        return self.process(xi=xi, x0=x0, dt=self.dt, **kw)


def WienerProcess(x0, sigma, dt, name="wp", N_steps=None):
    """Wiener-process model; tuple args become (log)normal priors."""
    if isinstance(x0, tuple):
        x0 = NormalPrior(x0[0], x0[1], name=name + "_x0")
    if isinstance(sigma, tuple):
        sigma = LogNormalPrior(sigma[0], sigma[1], name=name + "_sigma")
    return GaussMarkovProcess(
        wiener_process, x0, dt, name=name, N_steps=N_steps, sigma=sigma
    )


def IntegratedWienerProcess(x0, sigma, dt, name="iwp", asperity=None, N_steps=None):
    """IWP model (used for power-spectrum deviations in the CF model)."""
    if isinstance(x0, tuple):
        x0 = NormalPrior(x0[0], x0[1], shape=(2,), name=name + "_x0")
    if isinstance(sigma, tuple):
        sigma = LogNormalPrior(sigma[0], sigma[1], name=name + "_sigma")
    if isinstance(asperity, tuple):
        asperity = LogNormalPrior(asperity[0], asperity[1], name=name + "_asperity")
    return GaussMarkovProcess(
        integrated_wiener_process, x0, dt,
        name=name, N_steps=N_steps, sigma=sigma, asperity=asperity,
    )


def OrnsteinUhlenbeckProcess(sigma, gamma, dt, name="oup", x0=None, N_steps=None):
    """OU-process model; steady-state init for ``x0`` when unset."""
    if isinstance(sigma, tuple):
        sigma = LogNormalPrior(sigma[0], sigma[1], name=name + "_sigma")
    if isinstance(gamma, tuple):
        gamma = LogNormalPrior(gamma[0], gamma[1], name=name + "_gamma")
    if x0 is None:
        key = name + "_x0"

        def gen_x0(x):
            sig = sigma(x) if isinstance(sigma, LazyModel) else sigma
            return x[key] * (sig if _isscalar(sig) else sig[0])

        domain = {key: ShapeWithDtype(())}
        init = Initializer({key: partial(random_like, primals=domain[key])})
        if isinstance(sigma, LazyModel):
            domain = {**domain, **sigma.domain}
            init = init | sigma.init
        x0 = Model(gen_x0, domain=domain, init=init)
    elif isinstance(x0, tuple):
        x0 = NormalPrior(x0[0], x0[1], name=name + "_x0")
    return GaussMarkovProcess(
        ornstein_uhlenbeck_process, x0, dt,
        name=name, N_steps=N_steps, sigma=sigma, gamma=gamma,
    )
