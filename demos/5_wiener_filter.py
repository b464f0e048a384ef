#!/usr/bin/env python
"""Linear Wiener filter (reference: ``demos/old_nifty/getting_started_1.py``,
``demos/re/hmc_wiener_filter.py``).

A known-covariance Gaussian signal observed through a masked response with
Gaussian noise — posterior mean by CG on the Wiener-filter curvature, and
posterior samples via the metric-sample + inverse-metric-CG construction.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp
import numpy as np

from nifty_tpu.ops.harmonic import fourier_mode_lengths, hartley
from nifty_tpu.wiener_filter import draw_posterior_sample, wiener_filter


def main(dims=(256, 256), seed=42):
    key = jax.random.PRNGKey(seed)

    # Signal covariance: power-law spectrum on the harmonic grid.
    k = jnp.asarray(fourier_mode_lengths(dims, 1.0 / dims[0]))
    amp = jnp.where(k == 0.0, 1.0, (1.0 + (k / 4.0) ** 2) ** (-3.0 / 2.0))
    # floor the spectrum so the f32 curvature stays CG-friendly
    amp = jnp.maximum(amp, 1e-3 * amp.max())
    npix = float(np.prod(dims))
    # normalize to unit a-priori pointwise variance: Var[s] = sum(amp^2)/npix^2
    amp = amp / jnp.sqrt(jnp.sum(amp**2)) * npix

    def S_sqrt(xi):  # harmonic white noise -> correlated signal
        return hartley(amp * xi) / jnp.sqrt(npix)

    def S_inv(s):
        sh = hartley(s) / jnp.sqrt(npix)
        return hartley(sh / amp**2) / jnp.sqrt(npix)

    def S_inv_sqrt(xi):
        return hartley(xi / amp) / jnp.sqrt(npix)

    def S_apply(x):  # CG preconditioner: S itself (curvature ~ S^-1)
        sh = hartley(x) / jnp.sqrt(npix)
        return hartley(sh * amp**2) / jnp.sqrt(npix)

    # Response: observe a masked subset of pixels.
    key, sub = jax.random.split(key)
    mask = jax.random.uniform(sub, dims) > 0.3  # keep ~70%

    def R(s):
        return jnp.where(mask, s, 0.0)

    noise_std = 0.1

    def N_inv(d):
        return d / noise_std**2

    def N_inv_sqrt(xi):
        return xi / noise_std

    # Synthetic truth + data.
    key, sub = jax.random.split(key)
    s_truth = S_sqrt(jax.random.normal(sub, dims))
    key, sub = jax.random.split(key)
    data = R(s_truth) + noise_std * jax.random.normal(sub, dims) * mask

    proto = jnp.zeros(dims)
    m, info = wiener_filter(data, R, N_inv, S_inv, domain_proto=proto,
                            cg_kwargs=dict(resnorm=1e-4, maxiter=500,
                                           preconditioner=S_apply))
    print("posterior mean: CG info", int(info))
    err = float(jnp.sqrt(jnp.mean((m - s_truth) ** 2) / jnp.mean(s_truth**2)))
    print(f"relative reconstruction error: {err:.3f}")

    key, sub = jax.random.split(key)
    samp, sinfo = draw_posterior_sample(
        sub, R, N_inv, S_inv, S_sqrt, N_inv_sqrt,
        domain_proto=proto, data_proto=jnp.zeros(dims), mean=m,
        S_inv_sqrt=S_inv_sqrt,
        cg_kwargs=dict(resnorm=1e-4, maxiter=500, preconditioner=S_apply),
    )
    print("posterior sample std about mean:", float(jnp.std(samp - m)),
          "CG info", int(sinfo))
    assert err < 0.5
    return m


if __name__ == "__main__":
    main()
