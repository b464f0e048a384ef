#!/usr/bin/env python
"""Poisson log-normal counts map (reference: ``README.md:60-96``).

Counts data with a log-normal correlated-field intensity, inferred with
geoVI using the Poissonian likelihood's exact metric square root.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp

import nifty_tpu as jft


def main(dims=(128, 128)):
    key = jax.random.PRNGKey(42)

    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=2.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(
        dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1),
    )
    cf = cfm.finalize()
    lam = jft.Model(lambda x: jnp.exp(cf(x)), domain=cf.domain, init=cf.init)

    key, sk = jax.random.split(key)
    truth = lam(lam.init(sk))
    key, sk = jax.random.split(key)
    data = jax.random.poisson(sk, truth)

    lh = jft.Poissonian(data).amend(lam)

    key, k_i, k_o = jax.random.split(key, 3)
    samples, state = jft.optimize_kl(
        lh,
        jft.random_like(k_i, lh.domain),
        key=k_o,
        n_total_iterations=5,
        n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=80)),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-3, maxiter=4)
        ),
        kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-4, maxiter=20)),
        sample_mode="nonlinear_resample",
        odir="results_poisson",
    )
    pm, ps = jft.mean_and_std([lam(s) for s in samples])
    _, msg = jft.minisanity(samples, lh.normalized_residual)
    print(msg)
    p = jft.Plot()
    p.add(jnp.asarray(truth), title="truth")
    p.add(jnp.asarray(data).astype(float), title="counts")
    p.add(jnp.asarray(pm), title="posterior mean")
    p.add(jnp.asarray(ps), title="posterior std")
    p.output(name="results_poisson/summary.png")


if __name__ == "__main__":
    main()
