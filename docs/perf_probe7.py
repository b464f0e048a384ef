#!/usr/bin/env python
"""Decompose the 128^2 metric matvec: which sub-op costs the 0.29 ms?

Chained-scan timing (two lengths, difference cancels dispatch) of each
constituent of `J^T N^-1 J + 1` for the bench CF at 128^2.
"""
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
from nifty_tpu.ops.harmonic import hartley
import docs.perf_probe2 as p2

RES = []


def chain_time(f, x0, k_lo=16, k_hi=256, reps=5):
    """Per-application seconds of y = f(y) via two chained-scan lengths."""

    def chain(k):
        def g(x):
            def body(c, _):
                return f(c), ()
            y, _ = jax.lax.scan(body, x, None, length=k)
            return y
        return jax.jit(g)

    def timed(fn):
        out = jax.block_until_ready(fn(x0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(x0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(chain(k_lo)), timed(chain(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    dims = (128, 128)
    lh, cf = p2.build(dims, None)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    x2 = jax.random.normal(jax.random.PRNGKey(2), dims)

    # pure pointwise baseline
    RES.append({"op": "pointwise_exp", "ms": chain_time(
        lambda x: jnp.exp(0.1 * x), x2) * 1e3})
    # single Hartley
    RES.append({"op": "hartley", "ms": chain_time(
        lambda x: hartley(x) * (1.0 / (1 + 1e-9)), x2) * 1e3})
    # CF forward (amplitude chain + distributor + Hartley)
    def fwd(x):
        y = cf(x)
        # feed back into the latent's grid leaf to keep the chain honest
        return {**x, "cfxi": y * 1e-3 + x["cfxi"]}
    RES.append({"op": "cf_forward", "ms": chain_time(fwd, dict(pos)) * 1e3})

    # likelihood value+grad (fwd + vjp)
    vg = jax.value_and_grad(lambda p: lh(p))
    def vgstep(x):
        v, g = vg(x)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-6 * b, x, g)
    RES.append({"op": "lh_value_and_grad", "ms": chain_time(vgstep, dict(pos)) * 1e3})

    # metric matvec (the CG hot op)
    met = lh.metric
    def mv(t):
        return met(pos, t)
    RES.append({"op": "metric_matvec", "ms": chain_time(mv, dict(pos)) * 1e3})

    # metric matvec with a PRE-LINEARIZED jvp/vjp pair (what CG actually
    # runs inside draw_linear_residual)
    fwd_only = lambda p: lh.likelihood_fn(p) if hasattr(lh, "likelihood_fn") else None
    try:
        import nifty_tpu.evi as evi
        # draw_linear_residual internals: metric via jax.linearize
        f = lambda p: lh(p)
        _, jvp = jax.linearize(lambda p: lh.metric(pos, p), pos)
        RES.append({"op": "linearized_metric_matvec", "ms": chain_time(
            jvp, dict(pos)) * 1e3})
    except Exception as e:
        RES.append({"op": "linearized_metric_matvec", "error": repr(e)[:120]})

    # amplitude-only chain (the non-grid part of the CF)
    try:
        amp = cf._fluctuations[0] if hasattr(cf, "_fluctuations") else None
    except Exception:
        amp = None
    print(json.dumps(RES, indent=1))
    with open("/root/repo/docs/perf_probe7.json", "w") as f:
        json.dump(RES, f, indent=1)


if __name__ == "__main__":
    main()
