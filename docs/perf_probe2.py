#!/usr/bin/env python
"""Stage-2 roofline probe: decompose the 4096^2 metric matvec, measure
amortized (in-jit scan) FFT/Hartley/gather costs, properly-warmed fused
iterations, and the smap memory path for the 4-pair 4096^2 config.

Appends records to docs/perf_probe2.json.
"""

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
from nifty_tpu.ops.pallas_gather import distribute_power

OUT = "/root/repo/docs/perf_probe2.json"
records = []


def emit(rec):
    records.append(rec)
    print(json.dumps(rec), flush=True)
    with open(OUT, "w") as f:
        json.dump(records, f, indent=1)


def amortized(fn, x, n_inner=10, n_outer=3):
    """Time `fn` applied n_inner times inside one jit (removes dispatch)."""

    @jax.jit
    def rep(x):
        def body(c, _):
            return fn(c), None

        return jax.lax.scan(body, x, None, length=n_inner)[0]

    jax.block_until_ready(rep(x))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        out = rep(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (n_outer * n_inner)


def build(dims, n_bins=None, seed=0, noise_std=0.1):
    import jax as _jax
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    kw = {} if n_bins is None else dict(n_bins=n_bins)
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2), **kw,
    )
    cf = cfm.finalize()
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    # jit the synthetic-data pass: eager op-by-op dispatch over the
    # tunneled runtime takes minutes at 4096^2.
    truth = _jax.jit(lambda k: cf(cf.init(k)))(k1)
    data = truth + noise_std * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / noise_std**2).amend(cf)
    return lh, cf


def decompose(dims, n_bins):
    rec = {"probe": "decompose", "dims": dims, "n_bins": n_bins}
    lh, cf = build(dims, n_bins)
    pos = jft.random_like(jax.random.PRNGKey(1), lh.domain)
    x = jax.random.normal(jax.random.PRNGKey(0), dims, jnp.float32)

    rec["rfftn_us"] = amortized(
        lambda c: jnp.fft.irfftn(jnp.fft.rfftn(c), s=dims), x
    ) * 1e6
    rec["hartley_us"] = amortized(lambda c: hartley(c), x) * 1e6

    # distributor gather + its transpose (via vjp)
    dist = None
    for g in cf.grids if hasattr(cf, "grids") else []:
        pass
    # rebuild distributor indices the same way finalize does
    from nifty_tpu.models.correlated_field import make_grid

    grid = make_grid(dims, 1.0 / dims[0], n_bins=n_bins) if n_bins else make_grid(dims, 1.0 / dims[0])
    didx = np.asarray(grid.harmonic_grid.power_distributor)
    tbl = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (int(didx.max()) + 1,)))
    rec["n_table"] = int(didx.max()) + 1
    rec["gather_us"] = amortized(
        lambda t: distribute_power(t, didx)[tuple([0] * len(dims))] + t, tbl,
    ) * 1e6  # ~gather cost; scalar add keeps the scan carry small
    _, gvjp = jax.vjp(lambda t: distribute_power(t, didx), tbl)
    rec["scatter_adjoint_us"] = amortized(
        lambda c: gvjp(c * 1.000001)[0][0] * 0 + c, x
    ) * 1e6

    # forward, vjp, metric matvec — amortized through the latent tree
    fwd_lin, vjp_fn = jax.vjp(cf, pos)

    @jax.jit
    def rep_fwd(p):
        def body(c, _):
            out = cf(c)
            # fold output back into xi to keep a data dependence
            c = dict(c)
            c["cfxi"] = c["cfxi"] + 1e-30 * out
            return c, None

        return jax.lax.scan(body, p, None, length=5)[0]

    jax.block_until_ready(rep_fwd(pos))
    t0 = time.perf_counter()
    out = rep_fwd(pos)
    jax.block_until_ready(out)
    rec["forward_amortized_us"] = (time.perf_counter() - t0) / 5 * 1e6

    met_at = None
    tan = jft.random_like(jax.random.PRNGKey(3), lh.domain)

    @jax.jit
    def rep_met(t):
        def body(c, _):
            m = lh.metric(pos, c)
            return jax.tree_util.tree_map(lambda a, b: b + 1e-30 * a, c, m), None

        return jax.lax.scan(body, t, None, length=5)[0]

    jax.block_until_ready(rep_met(tan))
    t0 = time.perf_counter()
    out = rep_met(tan)
    jax.block_until_ready(out)
    rec["metric_matvec_amortized_us"] = (time.perf_counter() - t0) / 5 * 1e6

    # hoisted (linearized) metric matvec — what the CG loop actually runs
    from jax.tree_util import Partial

    @jax.jit
    def rep_met_lin(t):
        _, met_lin = jax.linearize(Partial(lh.metric, pos), t)

        def body(c, _):
            m = met_lin(c)
            return jax.tree_util.tree_map(lambda a, b: b + 1e-30 * a, c, m), None

        return jax.lax.scan(body, t, None, length=5)[0]

    jax.block_until_ready(rep_met_lin(tan))
    t0 = time.perf_counter()
    out = rep_met_lin(tan)
    jax.block_until_ready(out)
    rec["metric_matvec_linearized_us"] = (time.perf_counter() - t0) / 5 * 1e6
    return rec


def fused_timed(dims, n_bins, n_samples, residual_map, kl_map, label,
                n_warm=2, n_timed=1, fused=True):
    rec = {
        "probe": "fused", "dims": dims, "n_bins": n_bins,
        "n_samples": n_samples, "residual_map": residual_map,
        "kl_map": kl_map, "label": label, "fused": fused,
    }
    try:
        lh, cf = build(dims, n_bins)
        key = jax.random.PRNGKey(7)
        kwargs = dict(
            n_samples=n_samples,
            draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=50)),
            nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
                xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=20))),
            kl_kwargs=dict(minimize_kwargs=dict(
                xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30))),
            sample_mode="nonlinear_resample",
        )
        opt = jft.OptimizeVI(
            lh, n_total_iterations=10, residual_map=residual_map,
            kl_map=kl_map,
        )
        state = opt.init_state(key, **kwargs)
        samples = jft.Samples(
            pos=jft.random_like(jax.random.PRNGKey(1), lh.domain),
            samples=None, keys=None,
        )
        t_first = time.perf_counter()
        for i in range(n_warm):
            samples, state = opt.update(samples, state, fused=fused)
            jax.block_until_ready((samples, state))
            rec[f"warm{i}_s"] = time.perf_counter() - t_first
            t_first = time.perf_counter()
        t0 = time.perf_counter()
        for _ in range(n_timed):
            samples, state = opt.update(samples, state, fused=fused)
        jax.block_until_ready((samples, state))
        rec["iter_s"] = (time.perf_counter() - t0) / n_timed
        rec["samples_per_s"] = 2 * n_samples / rec["iter_s"]
        rec["energy"] = float(state.minimization_state.fun)
    except Exception as e:
        rec["error"] = repr(e)[:300]
    return rec


def main():
    # 1. matvec decomposition at the two big sizes
    emit(decompose((4096, 4096), 128))
    emit(decompose((1024, 1024), None))
    # 2. properly-warmed fused iterations (vmap) at moderate size
    emit(fused_timed((1024, 1024), 96, 4, "vmap", "vmap", "1024x1024 vmap"))
    # 3. the north star: 4096^2, 4 antithetic pairs, smap memory path
    emit(fused_timed((4096, 4096), 128, 4, "smap", "smap",
                     "4096x4096 binned smap NORTH STAR"))
    # 4. unbinned 4096^2, 4 pairs, smap (the config that device-faulted)
    emit(fused_timed((4096, 4096), None, 4, "smap", "smap",
                     "4096x4096 unbinned smap"))
    # 5. for reference: does vmap still fault at 4096^2 binned 4 pairs?
    emit(fused_timed((4096, 4096), 128, 4, "vmap", "vmap",
                     "4096x4096 binned vmap (fault check)"))


if __name__ == "__main__":
    main()
