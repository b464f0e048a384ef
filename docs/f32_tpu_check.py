#!/usr/bin/env python
"""Real-TPU f32 posterior-quality check (VERDICT r2 weak #3).

Runs the 64² correlated-field geoVI inference on the TPU chip (f32) and
on CPU (f64) with identical configs/keys, then compares posterior means
and stds on the CF output scale.  Pass criterion: f32-TPU posterior mean
within a fraction of the posterior std of the f64-CPU one (the same
statistical-equivalence standard as tests/test_f32_acceptance.py, but on
real hardware).  Writes docs/f32_tpu_check.json.
"""

import json
import subprocess
import sys

import numpy as np

WORKER = r"""
import sys, json
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
platform = sys.argv[1]
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
import nifty_tpu as jft
import logging
jft.logger.setLevel(logging.WARNING)

dims = (64, 64)
cfm = jft.CorrelatedFieldMaker("cf")
cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
cfm.add_fluctuations(dims, distances=1.0/dims[0], fluctuations=(1.0, 5e-1),
    loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1), asperity=(5e-1, 5e-2))
cf = cfm.finalize()
# identical f64 data on both platforms: the truth latents MUST be
# host-generated (jax.random.normal consumes keys differently per dtype,
# so device-side random_like would give each platform a different truth)
rng = np.random.default_rng(11)
truth_pos = jax.tree_util.tree_map(
    lambda s: jnp.asarray(rng.standard_normal(s.shape)),
    cf.domain,
    is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"),
)
truth = np.asarray(jax.jit(cf)(truth_pos), dtype=np.float64)
data = jnp.asarray(truth + 0.1 * rng.standard_normal(dims))
lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / 0.01).amend(cf)

samples, state = jft.optimize_kl(
    lh,
    jax.tree_util.tree_map(  # same start on both platforms (host RNG)
        lambda s: jnp.asarray(np.random.default_rng(17).standard_normal(s.shape)
                              * 0.1),
        lh.domain,
        is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"),
    ),
    key=jax.random.PRNGKey(7), n_total_iterations=10, n_samples=12,
    draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=80)),
    nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
        xtol=1e-4, maxiter=5, cg_kwargs=dict(maxiter=40))),
    kl_kwargs=dict(minimize_kwargs=dict(
        xtol=1e-5, maxiter=12, cg_kwargs=dict(maxiter=60))),
    sample_mode="nonlinear_resample",
)
fields = np.stack([np.asarray(cf(s), dtype=np.float64) for s in samples])
half = fields.shape[0] // 2
out = {"mean": fields.mean(0).tolist(), "std": fields.std(0).tolist(),
       "std_h1": fields[:half].std(0).tolist(),
       "std_h2": fields[half:].std(0).tolist(),
       "energy": float(state.minimization_state.fun)}
with open(f"/tmp/f32check_{platform}.json", "w") as f:
    json.dump(out, f)
print("done", platform)
"""


def run(platform):
    r = subprocess.run(
        [sys.executable, "-c", WORKER, platform],
        capture_output=True, text=True, timeout=3000,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{platform} worker failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    with open(f"/tmp/f32check_{platform}.json") as f:
        return json.load(f)


def main():
    tpu = run("tpu")
    cpu = run("cpu")
    m_t, m_c = np.asarray(tpu["mean"]), np.asarray(cpu["mean"])
    s_t, s_c = np.asarray(tpu["std"]), np.asarray(cpu["std"])
    spread = 0.5 * (s_t + s_c) + 1e-6
    z = np.abs(m_t - m_c) / spread
    # MC uncertainty of the std-ratio median: spread between ratios from
    # independent half-sample std estimates (same platform), i.e. the
    # resolution floor of this check.
    h_t1, h_t2 = np.asarray(tpu["std_h1"]), np.asarray(tpu["std_h2"])
    mc_floor = abs(float(np.median(h_t1 / (h_t2 + 1e-12))) - 1.0)
    ratio = float(np.median(s_t / s_c))
    rec = {
        "n_samples": 24,
        "mean_abs_diff": float(np.abs(m_t - m_c).mean()),
        "median_z": float(np.median(z)),
        "frac_z_gt3": float(np.mean(z > 3.0)),
        "std_ratio_median": ratio,
        "std_ratio_mc_floor": mc_floor,
        "energy_tpu_f32": tpu["energy"],
        "energy_cpu_f64": cpu["energy"],
        # Tight acceptance (VERDICT r3 weak #1): posterior std must agree
        # within 10%, means within a fraction of the posterior std.
        "pass": bool(np.median(z) < 1.0 and np.mean(z > 3.0) < 0.05
                     and 0.9 < ratio < 1.1),
    }
    print(json.dumps(rec))
    with open("/root/repo/docs/f32_tpu_check.json", "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
