#!/usr/bin/env python
"""Non-parametric 1-D density estimation from event counts
(reference: ``demos/old_nifty/density_estimation.py``, classic
``density_estimator`` ``src/sugar.py:226``).

Events are binned to counts; the rate is the exponentiated Matérn
correlated field on a padded grid (to decouple the periodic boundary),
inferred with geoVI + the Poissonian likelihood.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft
from nifty_tpu.sugar import density_estimator


def main(n_bins=128, n_events=1500, seed=3):
    rng = np.random.default_rng(seed)
    # Truth: bimodal density on [0, 1).
    events = np.concatenate([
        rng.normal(0.3, 0.05, n_events // 2),
        rng.normal(0.7, 0.1, n_events // 2),
    ])
    events = events[(events >= 0) & (events < 1)]
    counts = jnp.asarray(
        np.histogram(events, bins=n_bins, range=(0.0, 1.0))[0]
    )

    model, cfm = density_estimator(n_bins, 1.0 / n_bins)
    lh = jft.Poissonian(counts).amend(model)

    key = jax.random.PRNGKey(seed)
    key, k_init, k_opt = jax.random.split(key, 3)
    samples, state = jft.optimize_kl(
        lh,
        jft.Vector(lh.init(k_init)),
        n_total_iterations=6,
        n_samples=2,
        key=k_opt,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-4, maxiter=50)),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-4, maxiter=5)
        ),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-4, maxiter=20)),
        odir=None,
    )

    post_rates = jnp.stack([model(s) for s in samples])
    rate_mean = post_rates.mean(0)
    # total predicted events should match the observed count
    tot_pred = float(rate_mean.sum())
    tot_obs = float(counts.sum())
    print(f"predicted events {tot_pred:.1f} vs observed {tot_obs}")
    assert abs(tot_pred - tot_obs) < 0.25 * tot_obs
    # the two modes should show up as local maxima regions
    dens = np.asarray(rate_mean)
    third = n_bins // 3
    assert dens[:third].max() > dens[third:2 * third].min()
    print("density estimation OK")
    return rate_mean


if __name__ == "__main__":
    main()
