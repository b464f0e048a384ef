#!/usr/bin/env python
"""Binary-event (Bernoulli) inference of a log-probability field.

A correlated field sets a latent event-probability map through a sigmoid;
the data are one Bernoulli draw per pixel.  First a MAP estimate
(``optimize_kl`` with ``n_samples=0`` — the driver's point-estimate mode,
running Newton-CG on the standard Hamiltonian), then a few geoVI
iterations for pixel-wise uncertainties.

Capability parity: the classic ``demos/old_nifty/bernoulli_map.py``
(MAP with ``BernoulliEnergy``); the Bernoulli likelihood is absent from
the reference's JAX stack but first-class here
(``nifty_tpu/likelihood_impl.py``).
Runs on CPU: ``JAX_PLATFORMS=cpu python demos/14_bernoulli_map.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft


def main(dims=(128, 128), seed=42, out_dir="results_bernoulli"):
    key = jax.random.PRNGKey(seed)

    cfm = jft.CorrelatedFieldMaker("sky")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.5, 0.3),
        loglogavgslope=(-3.5, 0.2), flexibility=(1.0, 0.5),
        asperity=(0.5, 0.1),
    )
    cf = cfm.finalize()

    # Event probability: sigmoid of the correlated field, kept strictly
    # inside (eps, 1-eps).  One Bernoulli draw per pixel saturates p -> 0/1
    # otherwise, and the Fisher metric 1/(p(1-p)) (and log p in the
    # energy) diverges there at f32.
    eps = 1e-4

    def _prob(x):
        return eps + (1.0 - 2 * eps) * jax.nn.sigmoid(cf(x))

    prob = jft.Model(_prob, domain=cf.domain, init=cf.init)

    key, sk, dk = jax.random.split(key, 3)
    truth_p = prob(prob.init(sk))
    data = jax.random.bernoulli(dk, truth_p).astype(jnp.int32)
    lh = jft.Bernoulli(data).amend(prob)

    # --- MAP (point estimate; n_samples=0) -------------------------------
    key, ik, ok = jax.random.split(key, 3)
    map_samples, _ = jft.optimize_kl(
        lh, jft.random_like(ik, lh.domain), key=ok,
        n_total_iterations=12, n_samples=0,
        kl_kwargs=dict(minimize_kwargs=dict(
            name="MAP", xtol=1e-6, maxiter=25, cg_kwargs=dict(maxiter=60))),
        odir=None, plot_energy_history=False,
    )
    p_map = prob(map_samples.pos)

    # --- geoVI for uncertainties ----------------------------------------
    key, ok2 = jax.random.split(key)
    vi_samples, _ = jft.optimize_kl(
        lh, map_samples.pos, key=ok2,
        n_total_iterations=4, n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=50)),
        nonlinearly_update_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=20))),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=30))),
        sample_mode="nonlinear_resample",
        odir=None, plot_energy_history=False,
    )
    p_mean, p_std = jft.mean_and_std(tuple(prob(s) for s in vi_samples))

    err_map = float(jnp.mean(jnp.abs(p_map - truth_p)))
    err_vi = float(jnp.mean(jnp.abs(p_mean - truth_p)))
    # fraction of pixels whose truth lies within 2 posterior std
    cover = float(jnp.mean(jnp.abs(p_mean - truth_p) <= 2.0 * p_std))
    acc = float(jnp.mean((p_mean > 0.5) == (truth_p > 0.5)))
    # MAP overfits one-draw-per-pixel Bernoulli data toward p in {0, 1}
    # (the classic demo shows the same); the posterior mean regularizes it.
    print(f"MAP   mean|p - truth| = {err_map:.4f}  (overfits by design)")
    print(f"geoVI mean|p - truth| = {err_vi:.4f}  (2-sigma coverage {cover:.2f})")
    print(f"posterior-mean decision accuracy (p>0.5): {acc:.3f}")
    assert err_vi < 0.25 and cover > 0.9, "posterior failed to recover the field"

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axs = plt.subplots(1, 4, figsize=(14, 3.2))
            for ax, (img, title) in zip(axs, [
                (truth_p, "truth p"), (np.asarray(data, float), "events"),
                (p_mean, "posterior mean"), (p_std, "posterior std"),
            ]):
                im = ax.imshow(np.asarray(img), origin="lower")
                ax.set_title(title)
                fig.colorbar(im, ax=ax, shrink=0.8)
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, "bernoulli.png"), dpi=120)
            print(f"figure written to {out_dir}/bernoulli.png")
        except Exception as e:
            print(f"(skipping figure: {e})")

    return p_map, p_mean, p_std


if __name__ == "__main__":
    main()
