#!/usr/bin/env python
"""Probe 4: north-star fused iteration with the new kernels."""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
sys.path.insert(0, "/root/repo")
import docs.perf_probe2 as p2

label = sys.argv[1] if len(sys.argv) > 1 else "binned"
if label == "binned":
    rec = p2.fused_timed((4096, 4096), 128, 4, "smap", "smap",
                         "4096x4096 binned smap v2-kernels")
elif label == "unbinned":
    rec = p2.fused_timed((4096, 4096), None, 4, "smap", "smap",
                         "4096x4096 unbinned smap v2-kernels",
                         n_warm=1, n_timed=1)
elif label == "unbinned_staged":
    rec = p2.fused_timed((4096, 4096), None, 4, "smap", "smap",
                         "4096x4096 unbinned smap staged (fused=False)",
                         n_warm=1, n_timed=1, fused=False)
elif label == "vmap":
    rec = p2.fused_timed((4096, 4096), 128, 4, "vmap", "vmap",
                         "4096x4096 binned vmap v2-kernels",
                         n_warm=1, n_timed=1)
print(json.dumps(rec))
with open(f"/root/repo/docs/perf_probe4_{label}.json", "w") as f:
    json.dump(rec, f, indent=1)
