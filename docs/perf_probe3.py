#!/usr/bin/env python
"""Probe 3: validate the new range-limited gather/scatter kernels on TPU,
re-measure the matvec, and re-check the suspicious 4µs hartley readings
with data-dependent carries."""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np
import sys

sys.path.insert(0, "/root/repo")
import nifty_tpu as jft
from nifty_tpu.ops.harmonic import hartley
from nifty_tpu.ops import pallas_gather as pg
from nifty_tpu.models.correlated_field import make_grid

OUT = "/root/repo/docs/perf_probe3.json"
records = []


def emit(rec):
    records.append(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "w") as f:
        json.dump(records, f, indent=1)


def amortized_dep(fn, x, n_inner=10, n_outer=3):
    """Data-dependent scan: carry feeds back a scaled output, nothing can
    be dead-code-eliminated or loop-invariant-hoisted."""

    @jax.jit
    def rep(x):
        def body(c, _):
            y = fn(c)
            return jax.tree_util.tree_map(
                lambda a, b: a + 1e-30 * jnp.mean(b) if a.shape != b.shape
                else 0.5 * a + 0.5 * b, c, y
            ) if False else (0.999 * c + 1e-3 * jnp.mean(y)), None

        def body2(c, _):
            y = fn(c)
            return 0.999 * c + 1e-3 * jnp.mean(y) * jnp.ones_like(c), None

        return jax.lax.scan(body2, x, None, length=n_inner)[0]

    jax.block_until_ready(rep(x))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = rep(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_outer * n_inner)


def main():
    dims = (4096, 4096)
    rec = {"probe": "kernels", "dims": dims, "n_bins": 128}
    grid = make_grid(dims, 1.0 / dims[0], n_bins=128)
    didx = np.asarray(grid.harmonic_grid.power_distributor)
    nb = int(didx.max()) + 1
    rec["nb"] = nb
    # static block range statistics (how narrow are the bin loops now?)
    blk = pg._BLOCK_ROWS * 128
    flat = didx.reshape(-1)
    padn = (-flat.size) % blk
    flatp = np.concatenate([flat, np.zeros(padn, dtype=flat.dtype)])
    spans = (flatp.reshape(-1, blk).max(1) - flatp.reshape(-1, blk).min(1)) + 1
    rec["block_span_mean"] = float(spans.mean())
    rec["block_span_max"] = int(spans.max())

    tbl = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (nb,))) + 0.1
    x = jax.random.normal(jax.random.PRNGKey(0), dims, jnp.float32)

    # forward gather (data-dependent)
    def fwd(t):
        return pg.distribute_power(t, didx)

    @jax.jit
    def rep_fwd(t):
        def body(c, _):
            y = fwd(c)
            return 0.999 * c + 1e-3 * jnp.mean(y) * jnp.ones_like(c), None

        return jax.lax.scan(body, t, None, length=10)[0]

    jax.block_until_ready(rep_fwd(tbl))
    t0 = time.perf_counter()
    out = rep_fwd(tbl)
    jax.block_until_ready(out)
    rec["gather_ms"] = (time.perf_counter() - t0) / 10 * 1e3

    # adjoint scatter (data-dependent)
    @jax.jit
    def rep_adj(c0):
        def body(c, _):
            y = pg.bin_scatter_p.bind(c.reshape(1, -1), didx, nb=nb)[0]
            return 0.999 * c + 1e-3 * jnp.mean(y) * jnp.ones_like(c), None

        return jax.lax.scan(body, c0, None, length=10)[0]

    jax.block_until_ready(rep_adj(x))
    t0 = time.perf_counter()
    out = rep_adj(x)
    jax.block_until_ready(out)
    rec["scatter_ms"] = (time.perf_counter() - t0) / 10 * 1e3

    # correctness vs XLA on-device
    got = pg.bin_scatter_p.bind(x.reshape(1, -1), didx, nb=nb)[0]
    ref = jax.ops.segment_sum(
        x.reshape(-1), jnp.asarray(flat), num_segments=nb
    )
    rec["scatter_max_rel_err"] = float(
        jnp.max(jnp.abs(got - ref) / (jnp.abs(ref) + 1e-30))
    )
    gotf = pg.distribute_power(tbl, didx)
    rec["gather_max_abs_err"] = float(jnp.max(jnp.abs(gotf - tbl[didx])))

    # hartley re-measure with dependent carry
    rec["hartley_ms"] = amortized_dep(lambda c: hartley(c), x) * 1e3
    rec["rfft_roundtrip_ms"] = amortized_dep(
        lambda c: jnp.fft.irfftn(jnp.fft.rfftn(c), s=dims), x
    ) * 1e3
    emit(rec)

    # end-to-end: metric matvec with the new kernels
    rec2 = {"probe": "matvec", "dims": dims, "n_bins": 128}
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2), n_bins=128,
    )
    cf = cfm.finalize()
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    truth = cf(cf.init(k1))
    data = truth + 0.1 * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_cov_inv=lambda z: z / 0.01).amend(cf)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    tan = jft.random_like(jax.random.PRNGKey(3), lh.domain)

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
    rec2["metric_matvec_ms"] = (time.perf_counter() - t0) / 5 * 1e3

    fwd_jit = jax.jit(cf)
    jax.block_until_ready(fwd_jit(pos))
    t0 = time.perf_counter()
    for _ in range(5):
        o = fwd_jit(pos)
    jax.block_until_ready(o)
    rec2["forward_ms"] = (time.perf_counter() - t0) / 5 * 1e3
    emit(rec2)


if __name__ == "__main__":
    main()
