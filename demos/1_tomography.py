#!/usr/bin/env python
"""Line-of-sight tomography (reference: ``demos/1_tomography.py``).

A 3-D (64^3 by default) correlated field probed by rays through the
volume (`SamplingCartesianGridLOS`), inferred with MGVI.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft


def main(dims=(64, 64, 64), n_rays=128):
    key = jax.random.PRNGKey(87)

    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-4.0, 5e-1),
    )
    cf = cfm.finalize()

    rng = np.random.default_rng(5)
    start = rng.uniform(0.05, 0.95, size=(n_rays, 3))
    end = rng.uniform(0.05, 0.95, size=(n_rays, 3))
    los = jft.SamplingCartesianGridLOS(
        start, end, shape=dims, distances=tuple(1.0 / d for d in dims),
        n_sampling_points=128,
    )

    fwd = jft.Model(
        lambda x: los(jnp.exp(cf(x))), domain=cf.domain, init=cf.init
    )

    key, sk = jax.random.split(key)
    truth_pos = fwd.init(sk)
    truth = fwd(truth_pos)
    noise_std = 0.05 * float(jnp.mean(jnp.abs(truth)))
    key, sk = jax.random.split(key)
    data = truth + noise_std * jax.random.normal(sk, truth.shape)

    lh = jft.Gaussian(data, lambda x: x / noise_std ** 2).amend(fwd)

    key, k_i, k_o = jax.random.split(key, 3)
    samples, state = jft.optimize_kl(
        lh,
        jft.random_like(k_i, lh.domain),
        key=k_o,
        n_total_iterations=5,
        n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-4, maxiter=15)),
        sample_mode="linear_resample",
        odir="results_tomography",
    )
    pm = jft.mean([jnp.exp(cf(s)) for s in samples])
    print("post-mean cube:", pm.shape)
    _, msg = jft.minisanity(samples, lh.normalized_residual)
    print(msg)


if __name__ == "__main__":
    main()
