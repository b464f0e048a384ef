#!/usr/bin/env python
"""Four VI flavors on a 2-D posterior you can plot exactly.

A two-parameter model — mean ``10 a`` and inverse standard deviation
``exp(-1.35 b)`` of a single Gaussian datum — gives a banana-shaped true
posterior over ``(a, b)``.  MGVI (linear resampling), geoVI (nonlinear
resampling), mean-field ADVI and full-covariance ADVI are each run on
the same standard Hamiltonian; their sample clouds are drawn over the
exact density and their moments compared against grid quadrature.

Capability parity: ``demos/old_nifty/variational_inference_visualized.py``
(MGVI/GeoVI/MeanfieldVI/FullCovarianceVI on the identical 2-D problem).
Runs on CPU: ``JAX_PLATFORMS=cpu python demos/15_vi_visualized.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft

SCALE = 10.0
SLOPE = 1.35


def forward(x):
    return (SCALE * x["a"], jnp.exp(-SLOPE * x["b"]))


def exact_log_density(a, b):
    """-H(a,b): standard-normal prior + VariableCovarianceGaussian energy
    of datum 0 with mean 10a and std_inv exp(-1.35 b)."""
    lh = 0.5 * (SCALE * a) ** 2 * np.exp(-2 * SLOPE * b) + SLOPE * b
    return -(lh + 0.5 * (a**2 + b**2))


def exact_moments(grid_a, grid_b):
    aa, bb = np.meshgrid(grid_a, grid_b, indexing="ij")
    z = np.exp(exact_log_density(aa, bb))
    z /= z.sum()
    ma, mb = (aa * z).sum(), (bb * z).sum()
    sa = np.sqrt(((aa - ma) ** 2 * z).sum())
    sb = np.sqrt(((bb - mb) ** 2 * z).sum())
    return (ma, mb, sa, sb), z


def main(out_dir="results_vi_visualized", seed=3):
    lh = jft.VariableCovarianceGaussian(jnp.zeros(())).amend(
        jft.Model(
            forward,
            domain={"a": jft.ShapeWithDtype(()), "b": jft.ShapeWithDtype(())},
            white_init=True,
        )
    )
    key = jax.random.PRNGKey(seed)

    grid_a = np.linspace(-0.9, 0.9, 401)
    grid_b = np.linspace(-4.5, 4.5, 401)
    (ma, mb, sa, sb), z = exact_moments(grid_a, grid_b)
    print(f"exact      : a = {ma:+.3f} ± {sa:.3f}   b = {mb:+.3f} ± {sb:.3f}")

    clouds = {}

    # --- MGVI and geoVI via the optimize_kl driver -----------------------
    for label, mode in [("MGVI", "linear_resample"),
                        ("geoVI", "nonlinear_resample")]:
        key, ik, ok = jax.random.split(key, 3)
        samples, _ = jft.optimize_kl(
            lh, jft.random_like(ik, lh.domain), key=ok,
            n_total_iterations=15, n_samples=20, sample_mode=mode,
            draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=30)),
            nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
                xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=20))),
            kl_kwargs=dict(minimize_kwargs=dict(
                xtol=1e-5, maxiter=15, cg_kwargs=dict(maxiter=20))),
            odir=None, plot_energy_history=False,
        )
        pts = np.stack(
            [np.asarray([s["a"] for s in samples]),
             np.asarray([s["b"] for s in samples])], -1,
        )
        clouds[label] = pts

    # --- parametric VI ---------------------------------------------------
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    mf = jft.MeanFieldVI(lh, n_samples=8)
    mf_params, _ = mf.run(k1, n_steps=2000)
    keys = jax.random.split(k2, 200)
    mf_s = jax.vmap(lambda k: mf.sample(mf_params, k))(keys)
    clouds["MFVI"] = np.stack(
        [np.asarray(mf_s["a"]), np.asarray(mf_s["b"])], -1
    )

    fc = jft.FullCovarianceVI(lh, n_samples=8)
    fc_params, _ = fc.run(k3, n_steps=2000)
    keys = jax.random.split(k4, 200)
    fc_s = jax.vmap(lambda k: fc.sample(fc_params, k))(keys)
    clouds["FCVI"] = np.stack(
        [np.asarray(fc_s["a"]), np.asarray(fc_s["b"])], -1
    )

    for label, pts in clouds.items():
        ea, eb = pts[:, 0].mean(), pts[:, 1].mean()
        da, db = pts[:, 0].std(), pts[:, 1].std()
        print(f"{label:<11}: a = {ea:+.3f} ± {da:.3f}   b = {eb:+.3f} ± {db:.3f}")
        assert abs(ea - ma) < 3 * sa and abs(eb - mb) < 3 * sb, label

    os.makedirs(out_dir, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(2, 2, figsize=(9, 8), sharex=True, sharey=True)
        for ax, (label, pts) in zip(axs.ravel(), clouds.items()):
            ax.contour(grid_a, grid_b, z.T, levels=8, linewidths=0.6)
            ax.scatter(pts[:, 0], pts[:, 1], s=6, alpha=0.6, c="crimson")
            ax.set_title(label)
            ax.set_xlabel("a")
            ax.set_ylabel("b")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "vi_visualized.png"), dpi=120)
        print(f"figure written to {out_dir}/vi_visualized.png")
    except Exception as e:
        print(f"(skipping figure: {e})")

    return clouds


if __name__ == "__main__":
    main()
