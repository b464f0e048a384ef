#!/usr/bin/env python
"""Probe 10: per-stage decomposition of the FULL VI iteration.

VERDICT r3 weak #3: 2048² → 4096² iteration time grew 8.7× for 4× pixels
while the matvec math predicts ~4×.  This probe times each stage of the
iteration separately — linear draw (per sample + smap batch), geoVI curve,
KL Newton-CG — with the exact bench budgets, at both sizes, so the
super-linear term can be attributed.  Appends to docs/perf_probe10.json.

Usage: perf_probe10.py [2048|4096] [binned|unbinned]
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import nifty_tpu as jft
from nifty_tpu.custom_map import smap
import docs.perf_probe2 as p2

OUT = "/root/repo/docs/perf_probe10.json"


def timed(fn, *args, n=2):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    binned = (sys.argv[2] if len(sys.argv) > 2 else "binned") == "binned"
    dims = (size, size)
    n_bins = 128 if binned else None
    n = 4  # antithetic pairs (bench config)

    lh, cf = p2.build(dims, n_bins)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    key = jax.random.PRNGKey(7)
    keys = jax.random.split(key, n)
    rec = {"probe": "stage_decompose", "dims": dims, "n_bins": n_bins,
           "n_samples": n}

    # Stage 1: linear draw, one sample (jit) and the 4-sample smap batch.
    draw1 = jax.jit(lambda l, p, k: jft.draw_linear_residual(
        l, p, k, cg_kwargs=dict(maxiter=50)))
    t0 = time.perf_counter()
    r1, _ = draw1(lh, pos, key)
    jax.block_until_ready(r1)
    rec["draw1_compile_plus_first_s"] = time.perf_counter() - t0
    rec["draw1_s"] = timed(lambda: draw1(lh, pos, key)[0])

    drawN = jax.jit(lambda l, p, ks: smap(
        lambda k: jft.draw_linear_residual(l, p, k, cg_kwargs=dict(maxiter=50)),
        in_axes=(0,))(ks))
    t0 = time.perf_counter()
    rN, _ = drawN(lh, pos, keys)
    jax.block_until_ready(rN)
    rec["drawN_compile_plus_first_s"] = time.perf_counter() - t0
    rec["drawN_s"] = timed(lambda: drawN(lh, pos, keys)[0])

    # Stage 2: geoVI curve, one (sample, sign) pair (bench budgets).
    curve1 = jax.jit(lambda l, p, r, k: jft.nonlinearly_update_residual(
        l, p, r, k, 1.0, minimize_kwargs=dict(
            xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=20))))
    t0 = time.perf_counter()
    c1, _ = curve1(lh, pos, r1, key)
    jax.block_until_ready(c1)
    rec["curve1_compile_plus_first_s"] = time.perf_counter() - t0
    rec["curve1_s"] = timed(lambda: curve1(lh, pos, r1, key)[0])

    # Stage 3: KL Newton-CG over the 8 antithetic samples (smap KL map).
    from nifty_tpu.evi import Samples

    stacked = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, -x], axis=0), rN)
    smpls = Samples(pos=pos, samples=stacked, keys=None)
    opt = jft.OptimizeVI(lh, n_total_iterations=1, kl_map="smap",
                         residual_map="smap")
    t0 = time.perf_counter()
    res = opt.kl_minimize(smpls, minimize_kwargs=dict(
        xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30)))
    jax.block_until_ready(res.fun)
    rec["kl_compile_plus_first_s"] = time.perf_counter() - t0
    rec["kl_s"] = timed(lambda: opt.kl_minimize(smpls, minimize_kwargs=dict(
        xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30))).fun)

    rec["stage_sum_s"] = rec["drawN_s"] + 8 * rec["curve1_s"] + rec["kl_s"]
    print(json.dumps(rec), flush=True)
    try:
        with open(OUT) as f:
            records = json.load(f)
    except Exception:
        records = []
    records.append(rec)
    with open(OUT, "w") as f:
        json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
