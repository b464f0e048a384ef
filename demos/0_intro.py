#!/usr/bin/env python
"""Correlated-field inference 101 (reference: ``demos/0_intro.py``).

A 128x128 log-normal correlated field observed under Gaussian noise,
inferred with geoVI (`optimize_kl`): draws antithetic MGVI samples via
metric-CG, curves them nonlinearly, and Newton-CG-minimizes the sampled
KL.  Runs on CPU or a TPU chip unchanged.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp

import nifty_tpu as jft


def main():
    seed = 42
    key = jax.random.PRNGKey(seed)

    dims = (128, 128)
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=2.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
        asperity=(5e-1, 5e-2),
    )
    correlated_field = cfm.finalize()

    class Signal(jft.Model):
        def __init__(self, correlated_field):
            self.cf = correlated_field
            super().__init__(init=correlated_field.init)

        def __call__(self, x):
            return jnp.exp(self.cf(x))

    signal = Signal(correlated_field)

    key, sk = jax.random.split(key)
    pos_truth = signal.init(sk)
    signal_truth = signal(pos_truth)

    noise_cov_inv = lambda x: 0.1 ** -2 * x
    key, sk = jax.random.split(key)
    data = signal_truth + 0.1 * jax.random.normal(sk, signal_truth.shape)

    lh = jft.Gaussian(data, noise_cov_inv).amend(signal)

    n_vi_iterations = 6
    delta = 1e-4
    n_samples = 4

    key, k_i, k_o = jax.random.split(key, 3)
    samples, state = jft.optimize_kl(
        lh,
        jft.random_like(k_i, lh.domain),
        key=k_o,
        n_total_iterations=n_vi_iterations,
        n_samples=lambda i: n_samples // 2 if i < 2 else n_samples,
        draw_linear_kwargs=dict(
            cg_kwargs=dict(absdelta=delta * jft.tree.size(lh.domain) / 10.0,
                           maxiter=100)
        ),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=delta, maxiter=5)
        ),
        kl_kwargs=dict(
            minimize_kwargs=dict(absdelta=delta * jft.tree.size(lh.domain),
                                 maxiter=25)
        ),
        sample_mode=lambda i: "nonlinear_resample" if i >= 2
        else "linear_resample",
        odir="results_intro",
    )

    post_mean, post_std = jft.mean_and_std([signal(s) for s in samples])

    p = jft.Plot()
    p.add(jnp.asarray(signal_truth), title="truth")
    p.add(jnp.asarray(data), title="data")
    p.add(jnp.asarray(post_mean), title="posterior mean")
    p.add(jnp.asarray(post_std), title="posterior std")
    p.output(name="results_intro/summary.png")
    print("posterior written to results_intro/")


if __name__ == "__main__":
    main()
