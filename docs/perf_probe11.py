#!/usr/bin/env python
"""Probe 11: kernel strategies for the huge-table (unbinned) distributor.

The unbinned 4096² iteration is bound by the 4.2M-element quarter-grid
gather from a 1.2M-bin table and its scatter-add transpose.  This probe
times the candidate formulations on chip:

  a. XLA gather  table[idx]                     (current forward)
  b. XLA scatter-add transpose (via vjp)        (current adjoint)
  c. static-permutation gather x.flat[perm]     (cost of rank-sorting)
  d. cumsum + static boundary-diff segment sum  (scatter-free adjoint in
     sorted order: out[b] = S[end_b] - S[start_b])

If (c)+(d) beat (b), the adjoint should rank-sort once and use prefix
sums.  Appends to docs/perf_probe11.json.
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
from nifty_tpu.models.correlated_field import make_grid

OUT = "/root/repo/docs/perf_probe11.json"


def timed(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    hg = make_grid((size, size), 1.0 / size).harmonic_grid
    idx_q = np.asarray(hg.power_distributor_quarter)
    nb = int(hg.mode_lengths.size)
    nq = idx_q.size
    rec = {"probe": "huge_table_kernels", "size": size, "n_bins": nb,
           "n_quarter": nq}

    idx_dev = jnp.asarray(idx_q.ravel())
    table = jnp.asarray(np.random.default_rng(0).normal(size=nb), jnp.float32)
    cot = jnp.asarray(np.random.default_rng(1).normal(size=nq), jnp.float32)

    # a. forward gather
    ga = jax.jit(lambda t: t[idx_dev])
    rec["gather_ms"] = timed(ga, table) * 1e3

    # b. scatter-add transpose via vjp
    _, vjp = jax.vjp(lambda t: t[idx_dev], table)
    sb = jax.jit(lambda c: vjp(c)[0])
    rec["scatter_vjp_ms"] = timed(sb, cot) * 1e3

    # c. static permutation gather (host argsort; the rank-sorting cost)
    perm = np.argsort(idx_q.ravel(), kind="stable")
    perm_dev = jnp.asarray(perm.astype(np.int32))
    pc = jax.jit(lambda c: c[perm_dev])
    rec["perm_gather_ms"] = timed(pc, cot) * 1e3

    # d. cumsum + boundary-diff segment sum in sorted order
    sorted_ids = idx_q.ravel()[perm]
    starts = np.searchsorted(sorted_ids, np.arange(nb)).astype(np.int32)
    ends = np.searchsorted(sorted_ids, np.arange(nb) + 1).astype(np.int32)
    starts_dev, ends_dev = jnp.asarray(starts), jnp.asarray(ends)

    def seg(c_sorted):
        s = jnp.concatenate([jnp.zeros((1,), c_sorted.dtype),
                             jnp.cumsum(c_sorted)])
        return s[ends_dev] - s[starts_dev]

    sd = jax.jit(seg)
    c_sorted = cot[perm_dev]
    rec["cumsum_segsum_ms"] = timed(sd, c_sorted) * 1e3

    # d'. full scatter-free adjoint: permutation + cumsum + boundary diff
    full = jax.jit(lambda c: seg(c[perm_dev]))
    rec["perm_plus_segsum_ms"] = timed(full, cot) * 1e3

    # correctness cross-check
    ref = np.zeros(nb, np.float64)
    np.add.at(ref, idx_q.ravel(), np.asarray(cot, np.float64))
    got = np.asarray(full(cot), np.float64)
    rec["segsum_max_rel_err"] = float(
        np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
    )

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
