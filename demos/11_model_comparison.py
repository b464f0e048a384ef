#!/usr/bin/env python
"""Bayesian model comparison via the evidence lower bound.

Fits the same noisy data with two competing signal models — a smooth
correlated field (the true generative model) and an overly smooth
fixed-slope power law that cannot represent the data's small scales — runs geoVI on both, and ranks them by the ELBO
(reference theme: ``demos/old_nifty/model_comparison.py``; ELBO machinery
parity: ``src/re/evidence_lower_bound.py``).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

import nifty_tpu as jft


def build_cf(flexibility, prefix):
    dims = (64, 64)
    cfm = jft.CorrelatedFieldMaker(prefix)
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.5, 2e-1) if flexibility else (-6.0, 1e-2),
        flexibility=(1.0, 5e-1) if flexibility else None,
        asperity=(5e-1, 1e-1) if flexibility else None,
    )
    return cfm.finalize()


def fit(lh, key, name):
    key, ko, ki = jax.random.split(key, 3)
    samples, state = jft.optimize_kl(
        lh,
        jft.random_like(ki, lh.domain),
        key=ko,
        n_total_iterations=5,
        n_samples=2,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=64)),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-3, maxiter=5, cg_kwargs=dict(maxiter=24))
        ),
        kl_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-4, maxiter=10, cg_kwargs=dict(maxiter=32))
        ),
        sample_mode="nonlinear_resample",
        odir=f"results_mc/{name}",
    )
    return samples


def main():
    key = jax.random.PRNGKey(21)

    truth_model = build_cf(flexibility=True, prefix="true")
    key, sk = jax.random.split(key)
    truth = truth_model(truth_model.init(sk))

    noise_std = 0.1
    key, sk = jax.random.split(key)
    data = truth + noise_std * jax.random.normal(sk, truth.shape)

    results = {}
    for name, flex in [("flexible", True), ("rigid", False)]:
        cf = build_cf(flexibility=flex, prefix=name)
        lh = jft.Gaussian(
            data, noise_cov_inv=lambda x: x / noise_std**2
        ).amend(cf)
        key, sk = jax.random.split(key)
        samples = fit(lh, sk, name)
        _, stats = jft.estimate_evidence_lower_bound(
            lh, samples, n_eigenvalues=40, verbose=False
        )
        results[name] = stats
        print(
            f"{name:9s}: ELBO in [{float(stats['elbo_lw']):.1f}, "
            f"{float(stats['elbo_up']):.1f}]"
        )

    better = max(results, key=lambda k: float(results[k]["elbo_mean"]))
    print(f"model preferred by the evidence: {better}")
    assert better == "flexible", "ELBO should prefer the generative model"


if __name__ == "__main__":
    main()
