#!/usr/bin/env python
"""Decompose the 128^2 fused-update time: per-stage and per-CG-iteration
device cost at the headline bench size.

Method: every measurement is a single jitted dispatch containing a
data-dependent chain (feedback carry), timed twice with different inner
counts; the difference isolates per-iteration device cost from the
~2.6 ms tunnel dispatch floor.
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
import docs.perf_probe2 as p2

RES = []


def timed(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    dims = (128, 128)
    lh, cf = p2.build(dims, None)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    key = jax.random.PRNGKey(7)

    # --- dispatch floor ---
    nul = jax.jit(lambda x: x + 1.0)
    floor = timed(nul, jnp.zeros(()))
    RES.append({"stage": "dispatch_floor", "t_s": floor})

    # --- chained metric matvec: K=16 vs K=256 ---
    met = lh.metric

    def chain(k_iters):
        def f(x):
            def body(c, _):
                c = met(pos, c)
                return c, ()
            y, _ = jax.lax.scan(body, x, None, length=k_iters)
            return y
        return jax.jit(f)

    t16 = timed(chain(16), jft.random_like(key, lh.domain))
    t256 = timed(chain(256), jft.random_like(key, lh.domain))
    per_mv = (t256 - t16) / 240
    RES.append({"stage": "metric_matvec", "per_iter_ms": per_mv * 1e3,
                "t16_s": t16, "t256_s": t256})

    # --- draw_linear_residual at two CG budgets ---
    def draw(mi):
        return jax.jit(lambda p, k: jft.draw_linear_residual(
            lh, p, k, cg_kwargs=dict(maxiter=mi, miniter=mi)))

    t5 = timed(draw(5), pos, key)
    t50 = timed(draw(50), pos, key)
    RES.append({"stage": "draw_cg", "per_iter_ms": (t50 - t5) / 45 * 1e3,
                "t5_s": t5, "t50_s": t50})

    # --- full stages at the bench budget ---
    kw = dict(
        n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=50)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=20))),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30))),
        sample_mode="nonlinear_resample",
    )
    opt = jft.OptimizeVI(lh, n_total_iterations=10, residual_map="vmap")
    state = opt.init_state(key, **kw)
    samples = jft.Samples(pos=pos, samples=None, keys=None)
    for _ in range(2):
        samples, state = opt.update(samples, state)
        jax.block_until_ready((samples, state))
    t0 = time.perf_counter()
    for _ in range(3):
        samples, state = opt.update(samples, state)
    jax.block_until_ready((samples, state))
    RES.append({"stage": "fused_update", "t_s": (time.perf_counter() - t0) / 3})

    # stage split: draw only / draw+curve / kl only
    smpls2, st = opt.draw_samples(
        samples, key=key, sample_mode="linear_resample",
        point_estimates=(), n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=50)),
        nonlinearly_update_kwargs=kw["nonlinearly_update_kwargs"],
    )
    jax.block_until_ready(smpls2.pos)

    def draw_stage(mode):
        def f(s, k):
            out, _ = opt.draw_samples(
                s, key=k, sample_mode=mode, point_estimates=(),
                n_samples=4,
                draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=50)),
                nonlinearly_update_kwargs=kw["nonlinearly_update_kwargs"],
            )
            return out
        return f

    for mode in ("linear_resample", "nonlinear_resample"):
        f = draw_stage(mode)
        t = timed(f, samples, key, reps=3)
        RES.append({"stage": f"draw[{mode}]", "t_s": t})

    tkl = timed(lambda s: opt.kl_minimize(
        s, minimize_kwargs=dict(xtol=1e-4, maxiter=10,
                                cg_kwargs=dict(maxiter=30))), smpls2, reps=3)
    RES.append({"stage": "kl_minimize", "t_s": tkl})

    print(json.dumps(RES, indent=1))
    with open("/root/repo/docs/perf_probe6.json", "w") as f:
        json.dump(RES, f, indent=1)


if __name__ == "__main__":
    main()
