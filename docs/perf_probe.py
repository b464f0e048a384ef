#!/usr/bin/env python
"""Per-stage roofline probe for the geoVI hot loop (feeds docs/perf.md).

For each field size this times, on the real chip:
  - bare ``jnp.fft.rfftn`` / ``irfftn`` round trip on the same shape
    (the speed-of-light proxy for one Hartley application),
  - the correlated-field forward pass,
  - one metric matvec at a fixed linearization (the CG hot op),
  - one KL value_and_grad over 8 samples,
  - one full linear residual draw (CG, maxiter=50) incl. iteration count,
  - one full fused OptimizeVI iteration (the bench config).

Prints one JSON object per size to stdout and accumulates everything into
``docs/perf_probe.json``.
"""

import json
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    "/root/repo/.jax_cache",
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import nifty_tpu as jft
from nifty_tpu.optimize_kl import _kl_vg


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def build(dims, n_bins=None, seed=0, noise_std=0.1):
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    kw = {} if n_bins is None else dict(n_bins=n_bins)
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2), **kw,
    )
    cf = cfm.finalize()
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    truth = cf(cf.init(k1))
    data = truth + noise_std * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / noise_std**2).amend(cf)
    return lh, cf


def probe(dims, n_bins, n_samples=4, fused=True):
    rec = {"dims": dims, "n_bins": n_bins}
    lh, cf = build(dims, n_bins)
    key = jax.random.PRNGKey(7)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)

    # 1. bare FFT roundtrip (speed-of-light proxy for one Hartley)
    x = jax.random.normal(jax.random.PRNGKey(0), dims, jnp.float32)

    @jax.jit
    def fft_rt(x):
        return jnp.fft.irfftn(jnp.fft.rfftn(x), s=x.shape)

    rec["fft_roundtrip_ms"] = timeit(fft_rt, x) * 1e3

    # 2. forward pass
    fwd = jax.jit(cf)
    rec["forward_ms"] = timeit(fwd, pos) * 1e3

    # 3. metric matvec at fixed linearization
    met = jax.jit(lambda p, t: lh.metric(p, t))
    tangent = jft.random_like(jax.random.PRNGKey(2), lh.domain)
    rec["metric_matvec_ms"] = timeit(met, pos, tangent) * 1e3

    # 4. energy value_and_grad
    vg = jax.jit(jax.value_and_grad(lambda p: lh(p)))
    rec["value_and_grad_ms"] = timeit(vg, pos) * 1e3

    # 5. one linear residual draw (CG maxiter=50)
    def draw(pos, key):
        return jft.draw_linear_residual(
            lh, pos, key, cg_kwargs=dict(maxiter=50)
        )

    djit = jax.jit(draw)
    smpl, info = djit(pos, key)
    jax.block_until_ready(smpl)
    rec["draw_linear_ms"] = timeit(djit, pos, key, n=3, warmup=1) * 1e3
    # count actual CG iterations by re-running with return of info via a
    # probe: CGResults info is folded; instead use nit via _static_cg
    from nifty_tpu.solvers.cg import _static_cg
    from nifty_tpu.tree import random_like as rl, tree_add

    lhf, _ = lh.freeze(point_estimates=(), primals=pos)
    metf = jax.jit(
        lambda t: tree_add(lhf.metric_at(pos)(t), t)
    ) if False else None
    # simpler: one CG solve with nit surfaced
    metric_at = lh.metric_at(pos) if hasattr(lh, "metric_at") else None

    @jax.jit
    def cg_nit(key):
        j = rl(key, lh.domain)
        res = _static_cg(
            lambda t: tree_add(lh.metric(pos, t), t), j, maxiter=50
        )
        return res.nit

    rec["cg_iters_50cap"] = int(cg_nit(jax.random.PRNGKey(3)))

    # 6. full fused iteration (bench config)
    kwargs = dict(
        n_samples=n_samples,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=50)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=20))),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30))),
        sample_mode="nonlinear_resample",
    )
    if fused:
        opt = jft.OptimizeVI(lh, n_total_iterations=10)
        state = opt.init_state(key, **kwargs)
        samples = jft.Samples(pos=pos, samples=None, keys=None)
        try:
            samples, state = opt.update(samples, state)
            jax.block_until_ready((samples, state))
            t0 = time.perf_counter()
            samples, state = opt.update(samples, state)
            jax.block_until_ready((samples, state))
            rec["fused_iter_ms"] = (time.perf_counter() - t0) * 1e3
        except Exception as e:
            rec["fused_iter_error"] = repr(e)[:200]
    return rec


def main():
    sizes = [
        ((128, 128), None, 4),
        ((1024, 1024), None, 4),
        ((1024, 1024), 96, 4),
        ((2048, 2048), 128, 2),
        ((4096, 4096), 128, 1),
    ]
    out = []
    for dims, n_bins, n_s in sizes:
        try:
            rec = probe(dims, n_bins, n_samples=n_s)
        except Exception as e:
            rec = {"dims": dims, "n_bins": n_bins, "error": repr(e)[:300]}
        print(json.dumps(rec), flush=True)
        out.append(rec)
        with open("/root/repo/docs/perf_probe.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
