#!/usr/bin/env python
"""Final perf sweep for docs/perf.md: per-stage timings and full fused
geoVI iterations across sizes with the current kernels.  One JSON record
per config into docs/perf_sweep.json."""

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
from nifty_tpu.ops.harmonic import hartley
import docs.perf_probe2 as p2

OUT = "/root/repo/docs/perf_sweep.json"
records = []


def emit(rec):
    records.append(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "w") as f:
        json.dump(records, f, indent=1)


def dep_time(fn, x, n_inner=10):
    @jax.jit
    def rep(x):
        def body(c, _):
            y = fn(c)
            return 0.999 * c + 1e-3 * jnp.mean(y) * jnp.ones_like(c), None

        return jax.lax.scan(body, x, None, length=n_inner)[0]

    jax.block_until_ready(rep(x))
    t0 = time.perf_counter()
    out = rep(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_inner


def stages(dims, n_bins):
    rec = {"probe": "stages", "dims": dims, "n_bins": n_bins}
    lh, cf = p2.build(dims, n_bins)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    tan = jft.random_like(jax.random.PRNGKey(3), lh.domain)
    x = jax.random.normal(jax.random.PRNGKey(0), dims, jnp.float32)
    rec["hartley_ms"] = dep_time(lambda c: hartley(c), x) * 1e3
    rec["rfft_roundtrip_ms"] = dep_time(
        lambda c: jnp.fft.irfftn(jnp.fft.rfftn(c), s=dims), x
    ) * 1e3

    @jax.jit
    def rep_met(t):
        def body(c, _):
            m = lh.metric(pos, c)
            return jax.tree_util.tree_map(
                lambda a, b: 0.999 * a + 1e-3 * b, c, m
            ), None

        return jax.lax.scan(body, t, None, length=5)[0]

    jax.block_until_ready(rep_met(tan))
    t0 = time.perf_counter()
    out = rep_met(tan)
    jax.block_until_ready(out)
    rec["metric_matvec_ms"] = (time.perf_counter() - t0) / 5 * 1e3
    return rec


def main():
    # per-stage at each size
    for dims, nb in [((128, 128), None), ((1024, 1024), None),
                     ((1024, 1024), 96), ((2048, 2048), 128),
                     ((4096, 4096), 128)]:
        try:
            emit(stages(dims, nb))
        except Exception as e:
            emit({"probe": "stages", "dims": dims, "n_bins": nb,
                  "error": repr(e)[:200]})
    # fused iterations (vmap where it fits, smap at the top end)
    for dims, nb, ns, rmap in [
        ((128, 128), None, 4, "vmap"),
        ((1024, 1024), None, 4, "vmap"),
        ((1024, 1024), 96, 4, "vmap"),
        ((2048, 2048), 128, 4, "vmap"),
        ((2048, 2048), 128, 4, "smap"),
        ((4096, 4096), 128, 4, "smap"),
        ((2048, 2048), None, 4, "smap"),
        ((4096, 4096), None, 4, "smap"),
    ]:
        emit(p2.fused_timed(dims, nb, ns, rmap, rmap,
                            f"{dims[0]}^2 nb={nb} {rmap}"))


if __name__ == "__main__":
    main()
