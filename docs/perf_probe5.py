#!/usr/bin/env python
"""Bisect the unbinned-4096^2 device fault: run one stage per process."""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import nifty_tpu as jft
import docs.perf_probe2 as p2

stage = sys.argv[1]
dims = (4096, 4096)
lh, cf = p2.build(dims, None)
pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
key = jax.random.PRNGKey(7)
t0 = time.perf_counter()
if stage == "forward":
    out = jax.jit(cf)(pos); jax.block_until_ready(out)
elif stage == "vg":
    out = jax.jit(jax.value_and_grad(lambda p: lh(p)))(pos); jax.block_until_ready(out)
elif stage == "draw1":
    out = jax.jit(lambda p, k: jft.draw_linear_residual(
        lh, p, k, cg_kwargs=dict(maxiter=50)))(pos, key)
    jax.block_until_ready(out)
elif stage == "draw4smap":
    from nifty_tpu.custom_map import smap
    keys = jax.random.split(key, 4)
    out = jax.jit(smap(lambda k: jft.draw_linear_residual(
        lh, pos, k, cg_kwargs=dict(maxiter=50))))(keys)
    jax.block_until_ready(out)
elif stage == "curve1":
    resid, _ = jax.jit(lambda p, k: jft.draw_linear_residual(
        lh, p, k, cg_kwargs=dict(maxiter=50)))(pos, key)
    jax.block_until_ready(resid)
    out = jax.jit(lambda p, r: jft.nonlinearly_update_residual(
        lh, p, r, key, 1.0, minimize_kwargs=dict(
            xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=20))))(pos, resid)
    jax.block_until_ready(out)
elif stage == "drawnl":
    # the staged update's first half: 4 antithetic pairs, linear draw +
    # nonlinear curve, scan-over-samples
    opt = jft.OptimizeVI(lh, n_total_iterations=1,
                         residual_map="smap", kl_map="smap")
    samples = jft.Samples(pos=pos, samples=None, keys=None)
    out, _ = opt.draw_samples(
        samples, key=key, sample_mode="nonlinear_resample",
        point_estimates=(), n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=50)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=20))),
    )
    jax.block_until_ready(out.pos)
elif stage == "kl8":
    # the staged update's second half at full sample count: KL Newton-CG
    # over 8 antithetic samples (4 mirrored draws)
    from nifty_tpu.evi import Samples
    from nifty_tpu.custom_map import smap as _smap
    import jax.tree_util as jtu
    keys = jax.random.split(key, 4)
    resid, _ = jax.jit(_smap(lambda k: jft.draw_linear_residual(
        lh, pos, k, cg_kwargs=dict(maxiter=50))))(keys)
    jax.block_until_ready(resid)
    stacked = jtu.tree_map(
        lambda x: jnp.concatenate([x, -x], axis=0), resid)
    smpls = Samples(pos=pos, samples=stacked, keys=None)
    opt = jft.OptimizeVI(lh, n_total_iterations=1, kl_map="smap",
                         residual_map="smap")
    res = opt.kl_minimize(smpls, minimize_kwargs=dict(
        xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30)))
    jax.block_until_ready(res.x if res.x is not None else res.fun)
elif stage == "kl":
    from nifty_tpu.evi import Samples
    resid, _ = jax.jit(lambda p, k: jft.draw_linear_residual(
        lh, p, k, cg_kwargs=dict(maxiter=50)))(pos, key)
    jax.block_until_ready(resid)
    import jax.tree_util as jtu
    stacked = jtu.tree_map(lambda x: jnp.stack([x, -x]), resid)
    smpls = Samples(pos=pos, samples=stacked, keys=None)
    opt = jft.OptimizeVI(lh, n_total_iterations=1, kl_map="smap")
    res = opt.kl_minimize(smpls, minimize_kwargs=dict(
        xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30)))
    jax.block_until_ready(res.x if res.x is not None else res.fun)
print(json.dumps({"stage": stage, "ok": True,
                  "t_s": time.perf_counter() - t0}))
