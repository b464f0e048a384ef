#!/usr/bin/env python
"""Find the 128^2 backward-pass hog: distributor transpose vs amplitude
chain vs Hartley vjp.  Chained-scan timing as in probe7."""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import nifty_tpu as jft
from nifty_tpu.ops.harmonic import hartley, fourier_mode_distributor
import docs.perf_probe2 as p2
from docs.perf_probe7 import chain_time

RES = []


def main():
    dims = (128, 128)
    x2 = jax.random.normal(jax.random.PRNGKey(2), dims)

    # 1) binned CF (113-bin table -> Pallas kernels) value_and_grad
    lh_b, _ = p2.build(dims, 128)
    pos_b = jft.random_like(jax.random.PRNGKey(1), lh_b.domain)
    vg_b = jax.value_and_grad(lambda p: lh_b(p))
    def vgstep_b(x):
        v, g = vg_b(x)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-6 * b, x, g)
    RES.append({"op": "lh_vg_binned128", "ms": chain_time(vgstep_b, dict(pos_b)) * 1e3})

    # 2) unbinned again for reference
    lh_u, _ = p2.build(dims, None)
    pos_u = jft.random_like(jax.random.PRNGKey(1), lh_u.domain)
    vg_u = jax.value_and_grad(lambda p: lh_u(p))
    def vgstep_u(x):
        v, g = vg_u(x)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-6 * b, x, g)
    RES.append({"op": "lh_vg_unbinned", "ms": chain_time(vgstep_u, dict(pos_u)) * 1e3})

    # 3) hartley-only gradient
    def gh(x):
        v, g = jax.value_and_grad(lambda y: 0.5 * jnp.sum(hartley(y) ** 2))(x)
        return x + 1e-6 * g
    RES.append({"op": "grad_hartley_only", "ms": chain_time(gh, x2) * 1e3})

    # 4) distributor-only gradient (XLA path, 3238-entry table like the
    #    unbinned 128^2 CF)
    dist, counts, klen = fourier_mode_distributor(dims, (1.0 / 128,) * 2)
    dist = jnp.asarray(dist)
    nb = int(jnp.max(dist)) + 1
    w = jax.random.normal(jax.random.PRNGKey(3), dist.shape)
    t0 = jax.random.normal(jax.random.PRNGKey(4), (nb,))

    def gd(t):
        v, g = jax.value_and_grad(lambda tt: jnp.sum(tt[dist] * w))(t)
        return t + 1e-6 * g
    RES.append({"op": "grad_gather_xla_3238", "ms": chain_time(gd, t0) * 1e3,
                "nbins": nb})

    # 5) same through the Pallas primitive with the ceiling lifted
    from nifty_tpu.ops import pallas_gather as pg
    old_small, old_scatter = pg.SMALL_TABLE_MAX_BINS, pg.SCATTER_MAX_BINS
    pg.SMALL_TABLE_MAX_BINS = pg.SCATTER_MAX_BINS = 1 << 20
    try:
        def gp(t):
            v, g = jax.value_and_grad(
                lambda tt: jnp.sum(pg.bin_gather(tt, dist) * w))(t)
            return t + 1e-6 * g
        RES.append({"op": "grad_gather_pallas_3238",
                    "ms": chain_time(gp, t0) * 1e3})
    except Exception as e:
        RES.append({"op": "grad_gather_pallas_3238", "error": repr(e)[:160]})
    finally:
        pg.SMALL_TABLE_MAX_BINS, pg.SCATTER_MAX_BINS = old_small, old_scatter

    print(json.dumps(RES, indent=1))
    with open("/root/repo/docs/perf_probe8.json", "w") as f:
        json.dump(RES, f, indent=1)


if __name__ == "__main__":
    main()
