#!/usr/bin/env python
"""Nonlinear regression with hand-built priors (reference:
``demos/a_nonlinear_regression.py``).

Shows the model-DSL entry level below the correlated field: a custom
:class:`nifty_tpu.Model` subclass with a log-normal slope and a uniform
intercept, inferred with geoVI, and a posterior predictive band.  Runs on
CPU or TPU unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft


class NonLinearRegression(jft.Model):
    """y = slope * x + intercept with non-Gaussian priors on both."""

    slope: jft.prior.LogNormalPrior = None
    intercept: jft.prior.UniformPrior = None

    def __init__(self, slope_mean, slope_std, intercept_min, intercept_max, x):
        self.slope = jft.prior.LogNormalPrior(
            slope_mean, slope_std, name="slope"
        )
        self.intercept = jft.prior.UniformPrior(
            intercept_min, intercept_max, name="intercept"
        )
        self.x = x
        super().__init__(init=self.slope.init | self.intercept.init)

    def __call__(self, xi, x=None):
        x = self.x if x is None else x
        return x * self.slope(xi) + self.intercept(xi)


def main():
    key = jax.random.PRNGKey(42)

    key, sk = jax.random.split(key)
    x = jax.random.uniform(sk, (50,), minval=-4.0, maxval=4.0)
    nlr = NonLinearRegression(3.0, 2.0, -5.0, 5.0, x)

    noise_std = 5.0
    key_tr, key_n = jax.random.split(jax.random.PRNGKey(31415))
    truth = nlr.init(key_tr)
    y = nlr(truth) + noise_std * jax.random.normal(key_n, x.shape)

    lh = jft.Gaussian(y, noise_std_inv=lambda t: t / noise_std).amend(nlr)

    key, ki, ko = jax.random.split(key, 3)
    delta = 1e-4
    samples, state = jft.optimize_kl(
        lh,
        jft.random_like(ki, lh.domain),
        key=ko,
        n_total_iterations=5,
        n_samples=12,
        draw_linear_kwargs=dict(
            cg_kwargs=dict(absdelta=delta / 10.0, maxiter=50)
        ),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=delta, maxiter=10,
                                 cg_kwargs=dict(maxiter=30))
        ),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=delta, maxiter=15, cg_kwargs=dict(maxiter=30))),
        sample_mode="nonlinear_resample",
        odir=None,
    )

    x_p = jnp.linspace(float(x.min()), float(x.max()), 500)
    bands = jnp.stack([nlr(s, x=x_p) for s in samples])
    mean_line = np.asarray(bands.mean(axis=0))
    lo, hi = np.quantile(np.asarray(bands), (0.16, 0.84), axis=0)

    slope_post = np.asarray(jnp.stack([nlr.slope(s) for s in samples]))
    icpt_post = np.asarray(jnp.stack([nlr.intercept(s) for s in samples]))
    print(f"slope:     truth {float(nlr.slope(truth)):+.3f}  "
          f"posterior {slope_post.mean():+.3f} +- {slope_post.std():.3f}")
    print(f"intercept: truth {float(nlr.intercept(truth)):+.3f}  "
          f"posterior {icpt_post.mean():+.3f} +- {icpt_post.std():.3f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.plot(np.asarray(x), np.asarray(y), ".", ms=8, color="dodgerblue",
                label="data")
        ax.plot(np.asarray(x_p), mean_line, color="black", label="posterior mean")
        ax.fill_between(np.asarray(x_p), lo, hi, color="gray", alpha=0.3,
                        label="16-84% band")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        ax.legend()
        fig.tight_layout()
        fig.savefig("results_nonlinear_regression.png", dpi=120)
        print("wrote results_nonlinear_regression.png")
    except Exception as e:  # matplotlib optional
        print(f"(skipping plot: {e})")

    return slope_post, icpt_post, truth, nlr


if __name__ == "__main__":
    main()
