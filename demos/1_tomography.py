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


def main_at_scale(dims=(256, 256, 256), n_rays=1024, n_iters=3):
    """BASELINE config #4: 256³ correlated field (16.8M dof) + LOS
    tomography, geoVI via the memory-bounded smap path on one chip.
    Prints measured s/iteration (recorded in docs/perf.md / PARITY.md)."""
    import time

    key = jax.random.PRNGKey(87)
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-4.0, 5e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2), n_bins=128,
    )
    cf = cfm.finalize()

    rng = np.random.default_rng(5)
    start = rng.uniform(0.05, 0.95, size=(n_rays, 3))
    end = rng.uniform(0.05, 0.95, size=(n_rays, 3))
    los = jft.SamplingCartesianGridLOS(
        start, end, shape=dims, distances=tuple(1.0 / d for d in dims),
        n_sampling_points=256,
    )
    fwd = jft.Model(
        lambda x: los(jnp.exp(cf(x))), domain=cf.domain, init=cf.init
    )
    key, sk = jax.random.split(key)
    # jit the synthetic-data pass: eager op-by-op dispatch at 256^3 over
    # the tunneled runtime takes an hour instead of seconds.
    truth = jax.jit(lambda k: fwd(fwd.init(k)))(sk)
    noise_std = 0.05 * float(jnp.mean(jnp.abs(truth)))
    key, sk = jax.random.split(key)
    data = truth + noise_std * jax.random.normal(sk, truth.shape)
    lh = jft.Gaussian(data, lambda x: x / noise_std ** 2).amend(fwd)

    opt = jft.OptimizeVI(
        lh, n_total_iterations=n_iters, residual_map="smap", kl_map="smap"
    )
    key, sk = jax.random.split(key)
    state = opt.init_state(
        sk, n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=40)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-3, maxiter=3, cg_kwargs=dict(maxiter=15))),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-4, maxiter=6, cg_kwargs=dict(maxiter=20))),
        sample_mode="nonlinear_resample",
    )
    key, sk = jax.random.split(key)
    # conservative start (0.1x prior draw): at 16.8M dof a full prior
    # start let the first KL update jump ~25 sigma on the slope latent,
    # blowing the k^slope amplitude into f32 overflow (debug run 2026-08)
    samples = jft.Samples(
        pos=jax.tree_util.tree_map(
            lambda x: 0.1 * x, jft.random_like(sk, lh.domain)
        ),
        samples=None, keys=None,
    )
    times = []
    debug = "--debug" in sys.argv
    for i in range(n_iters):
        t0 = time.perf_counter()
        samples, state = opt.update(samples, state)
        jax.block_until_ready((samples, state))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"iter {i + 1}: {dt:.1f}s  "
              f"KL energy {float(state.minimization_state.fun):.4e}")
        if debug:
            import numpy as _np

            st = state.sample_state
            codes = getattr(st, "nit", st)
            print("  sampler state:", _np.asarray(codes).tolist())
            for k, v in samples.pos.items():
                a = _np.asarray(v)
                print(f"  |pos[{k}]| max {_np.abs(a).max():.3e} "
                      f"finite {bool(_np.isfinite(a).all())}")
            r = _np.asarray(jax.jit(lambda s_: cf(s_))(samples.pos))
            print(f"  cf(pos): max {_np.abs(r).max():.3e} "
                  f"finite {bool(_np.isfinite(r).all())}")
    print(f"256^3 geoVI: {min(times):.2f} s/iter (warm), "
          f"{2 * 2 / min(times):.3f} samples/s")
    _, msg = jft.minisanity(samples, lh.normalized_residual, map="lmap")
    print(msg)


if __name__ == "__main__":
    if "--at-scale" in sys.argv:
        main_at_scale()
    else:
        main()
