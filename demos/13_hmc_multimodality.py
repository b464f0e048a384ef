#!/usr/bin/env python
"""NUTS on a bimodal target: the mass matrix controls mode mixing.

A 1-D mixture of two well-separated Gaussians is sampled twice with the
NUTS chain — once with a small inverse mass matrix (short effective steps;
the chain gets stuck in one mode) and once with a large one (long
trajectories hop between modes).  The two-panel figure shows the sample
histogram against the analytic density plus the position trace.

Parity demo: the reference's ``demos/re/hmc_multimodality.py`` workflow;
the chain here is this framework's scan-compiled NUTS
(``nifty_tpu/hmc_oo.py``), which runs all transitions as one XLA program.
Runs in seconds on CPU: ``JAX_PLATFORMS=cpu python demos/13_hmc_multimodality.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from functools import partial

import jax

# Honor a cpu request even where a preregistered TPU plugin overrides the
# JAX_PLATFORMS env var at interpreter start.
if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft


def loggaussian(x, mu, sigma):
    return -0.5 * (x - mu) ** 2 / sigma


def sum_of_gaussians(x, separation, sigma1, sigma2):
    return -jnp.logaddexp(
        loggaussian(x, 0.0, sigma1), loggaussian(x, separation, sigma2)
    )


def run_chain(inverse_mass_matrix, *, n, seed, eps):
    sampler = jft.NUTSChain(
        potential_energy=partial(
            sum_of_gaussians, separation=10.0, sigma1=1.0, sigma2=1.0
        ),
        inverse_mass_matrix=inverse_mass_matrix,
        position_proto=jnp.array(0.0),
        step_size=eps,
        max_tree_depth=15,
        max_energy_difference=1000.0,
    )
    chain, _ = sampler.generate_n_samples(
        seed, jnp.array(3.0), num_samples=n
    )
    return chain


def main(n=20_000, seed=43, eps=0.3, out_dir="results_hmc_multimodality"):
    chains = {
        "m=0.2 (sticky)": run_chain(5.0, n=n, seed=seed, eps=eps),
        "m=0.02 (mixing)": run_chain(50.0, n=n, seed=seed, eps=eps),
    }

    # analytic density for comparison
    xs = np.linspace(-10, 20, 500)
    ham = partial(sum_of_gaussians, separation=10.0, sigma1=1.0, sigma2=1.0)
    dens = np.exp(-np.asarray(jax.vmap(ham)(jnp.asarray(xs))))
    dens /= np.trapezoid(dens, xs)

    for label, chain in chains.items():
        smpl = np.asarray(chain.samples)
        acc = float(np.mean(np.asarray(chain.acceptance)))
        frac_right = float(np.mean(smpl > 5.0))
        print(
            f"{label}: acceptance {acc:.2f}, "
            f"mass in right mode {frac_right:.2f}, "
            f"divergences {int(np.sum(np.asarray(chain.divergences)))}"
        )

    os.makedirs(out_dir, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(2, 2, figsize=(9, 5), sharex="col",
                                gridspec_kw={"width_ratios": [1, 2]})
        for row, (label, chain) in zip(axs, chains.items()):
            smpl = np.asarray(chain.samples)
            row[0].hist(smpl, bins=40, density=True, alpha=0.7)
            row[0].plot(xs, dens, "r", lw=0.8)
            row[0].set_title(label)
            row[1].plot(smpl, lw=0.3)
            row[1].set_title("trace")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "multimodal.png"), dpi=120)
        print(f"figure written to {out_dir}/multimodal.png")
    except Exception as e:  # matplotlib is optional for the numbers
        print(f"(skipping figure: {e})")

    return chains


if __name__ == "__main__":
    main()
