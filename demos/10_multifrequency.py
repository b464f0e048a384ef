#!/usr/bin/env python
"""Multi-frequency correlated field: outer product of two subgrid GPs.

A signal over space × frequency whose correlation structure factorizes
into independent non-parametric kernels per subgrid (the reference's
multi-subdomain ``CorrelatedFieldMaker``, ``demos/old_nifty/
getting_started_5_mf.py`` theme; here TPU-native).  The amplitude outer
product and the per-subgrid Hartley transforms run in one fused geoVI
program.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft


def main():
    key = jax.random.PRNGKey(5)

    n_x, n_f = 64, 16  # spatial pixels x frequency channels
    cfm = jft.CorrelatedFieldMaker("mf")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
    # spatial subgrid: rough spectrum with IWP deviations
    cfm.add_fluctuations(
        (n_x,), distances=1.0 / n_x, fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1.0, 5e-1),
        asperity=(5e-1, 1e-1), prefix="space",
    )
    # frequency subgrid: smoother
    cfm.add_fluctuations(
        (n_f,), distances=1.0 / n_f, fluctuations=(5e-1, 2e-1),
        loglogavgslope=(-4.0, 2e-1), flexibility=None, asperity=None,
        prefix="freq",
    )
    cf = cfm.finalize()

    key, sk = jax.random.split(key)
    pos_truth = cf.init(sk)
    truth = cf(pos_truth)
    assert truth.shape == (n_x, n_f)

    noise_std = 0.2
    key, sk = jax.random.split(key)
    data = truth + noise_std * jax.random.normal(sk, truth.shape)

    lh = jft.Gaussian(data, noise_cov_inv=lambda x: x / noise_std**2).amend(cf)

    key, ko, ki = jax.random.split(key, 3)
    samples, state = jft.optimize_kl(
        lh,
        jft.random_like(ki, lh.domain),
        key=ko,
        n_total_iterations=5,
        n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=64)),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=24))
        ),
        kl_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-4, maxiter=12, cg_kwargs=dict(maxiter=32))
        ),
        sample_mode="nonlinear_resample",
        odir="results_mf",
    )

    post = jnp.stack([cf(s) for s in samples])
    mean, std = post.mean(0), post.std(0)
    rms = float(jnp.sqrt(jnp.mean((mean - truth) ** 2)))
    print(f"posterior rms error {rms:.4f} (noise level {noise_std})")
    cov = float(
        (jnp.abs(mean - truth) < 3 * (std + noise_std)).mean()
    )
    print(f"pixels within 3sigma: {cov:.1%}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 3, figsize=(12, 3.5))
    for ax, (img, title) in zip(
        axs,
        [(truth, "truth"), (mean, "posterior mean"), (std, "posterior std")],
    ):
        im = ax.imshow(np.asarray(img).T, aspect="auto", origin="lower")
        ax.set_title(title)
        ax.set_xlabel("space")
        ax.set_ylabel("frequency")
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig("results_mf/posterior.png", dpi=100)

    # False-color view: frequency channels rendered as RGB, plus posterior
    # mean/std uncertainty panels through the Plot API.
    def as_cube(img):
        # (space, freq) -> (freq, strip_height, space) false-color strip
        return np.repeat(np.asarray(img).T[:, None, :], 8, axis=1)

    p = jft.Plot()
    p.add(as_cube(jnp.exp(truth)), freqs_as_rgb=True, title="truth (RGB)")
    p.add(as_cube(jnp.exp(mean)), freqs_as_rgb=True,
          title="posterior mean (RGB)")
    p.add_uncertainty(np.asarray(post), title="posterior")
    p.output(name="results_mf/rgb_and_uncertainty.png", xsize=10, ysize=8)
    print("posterior written to results_mf/")


if __name__ == "__main__":
    main()
