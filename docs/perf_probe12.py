#!/usr/bin/env python
"""Probe 12: unbinned fused iteration at 1024^2/2048^2 with the
sorted-adjoint distributor (RUNTIME_DIST_MIN_BYTES lowered so the
runtime-consts + sorted-scatter route activates below its 4096^2
default threshold)."""
import json
import os
import sys

import jax

if os.environ.get("NO_JAX_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
sys.path.insert(0, "/root/repo")

import nifty_tpu as jft

jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES = 1 << 19  # 512 KB

import docs.perf_probe2 as p2

size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
rec = p2.fused_timed(
    (size, size), None, 4, "smap", "smap",
    f"{size}x{size} unbinned smap sorted-adjoint",
    n_warm=1, n_timed=3,
)
rec["runtime_dist_min_bytes"] = jft.CorrelatedFieldMaker.RUNTIME_DIST_MIN_BYTES
print(json.dumps(rec))
with open(f"/root/repo/docs/perf_probe12_{size}.json", "w") as f:
    json.dump(rec, f, indent=1)
