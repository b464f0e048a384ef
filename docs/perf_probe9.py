#!/usr/bin/env python
"""Validate lifting the Pallas bin ceiling on the real unbinned 128^2 CF:
value_and_grad + metric matvec with SMALL_TABLE_MAX_BINS raised so the
3238-mode table takes the kernel path instead of XLA gather/scatter."""
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import nifty_tpu as jft
from nifty_tpu.ops import pallas_gather as pg
import docs.perf_probe2 as p2
from docs.perf_probe7 import chain_time

RES = []
CEIL = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def measure(tag, dims=(128, 128)):
    lh, _ = p2.build(dims, None)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    vg = jax.value_and_grad(lambda p: lh(p))

    def vgstep(x):
        v, g = vg(x)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-6 * b, x, g)

    RES.append({"op": f"lh_vg_{tag}", "ms": chain_time(vgstep, dict(pos)) * 1e3})

    met = lh.metric
    RES.append({"op": f"metric_matvec_{tag}",
                "ms": chain_time(lambda t: met(pos, t), dict(pos)) * 1e3})


def main():
    measure("xla")  # current ceilings: 3238-bin table -> XLA path
    pg.SMALL_TABLE_MAX_BINS = pg.SCATTER_MAX_BINS = CEIL
    measure(f"pallas_celittle{CEIL}")
    # correctness spot-check: gather and transpose against numpy
    import numpy as np
    from nifty_tpu.ops.harmonic import fourier_mode_distributor
    dist, _, _ = fourier_mode_distributor((128, 128), (1 / 128.0,) * 2)
    dist = jnp.asarray(dist)
    nb = int(jnp.max(dist)) + 1
    t = jax.random.normal(jax.random.PRNGKey(5), (nb,))
    got = pg.bin_gather(t, dist)
    np.testing.assert_allclose(np.asarray(got), np.asarray(t)[np.asarray(dist)],
                               rtol=1e-6)
    w = jax.random.normal(jax.random.PRNGKey(6), dist.shape)
    (ct,) = jax.linear_transpose(lambda tt: pg.bin_gather(tt, dist), t)(w)
    want = np.zeros(nb)
    np.add.at(want, np.asarray(dist).ravel(), np.asarray(w).ravel())
    np.testing.assert_allclose(np.asarray(ct), want, rtol=1e-4, atol=1e-4)
    RES.append({"check": "gather+transpose exact at nb=%d" % nb, "ok": True})

    print(json.dumps(RES, indent=1))
    with open("/root/repo/docs/perf_probe9.json", "w") as f:
        json.dump(RES, f, indent=1)


if __name__ == "__main__":
    main()
