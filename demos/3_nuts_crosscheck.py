#!/usr/bin/env python
"""NUTS cross-check on the VI log-density (reference: HMC usage in
``src/re/hmc_oo.py`` / SURVEY §3.5).

Runs geoVI and a NUTS chain on the same standardized Hamiltonian of a
small correlated-field problem and compares posterior moments.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft
from nifty_tpu.optimize_kl import _StandardHamiltonian


def main(dims=(32, 32)):
    key = jax.random.PRNGKey(11)
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(dims, 1.0 / dims[0], (1.0, 0.5), (-3.0, 0.2))
    cf = cfm.finalize()

    key, sk, nk = jax.random.split(key, 3)
    truth = cf(cf.init(sk))
    noise = 0.15
    data = truth + noise * jax.random.normal(nk, truth.shape)
    lh = jft.Gaussian(data, lambda x: x / noise ** 2).amend(cf)

    # --- geoVI -----------------------------------------------------------
    key, k_i, k_o = jax.random.split(key, 3)
    samples, _ = jft.optimize_kl(
        lh, jft.random_like(k_i, lh.domain), key=k_o,
        n_total_iterations=5, n_samples=4,
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=60)),
        kl_kwargs=dict(minimize_kwargs=dict(xtol=1e-5, maxiter=20)),
        sample_mode="linear_resample",
    )
    vi_mean = jft.mean([cf(s) for s in samples])

    # --- NUTS on the same log-density -----------------------------------
    ham = _StandardHamiltonian(lh)
    pe = jax.jit(lambda q: ham(q))
    chain = jft.NUTSChain(
        potential_energy=pe,
        inverse_mass_matrix=1.0,
        position_proto=samples.pos,
        step_size=0.05,
        max_tree_depth=8,
    )
    key, ck = jax.random.split(key)
    out, _ = chain.generate_n_samples(ck, samples.pos, 300)
    nuts_fields = jax.vmap(cf)(out.samples)
    nuts_mean = jnp.mean(nuts_fields[100:], axis=0)

    diff = float(jnp.sqrt(jnp.mean((vi_mean - nuts_mean) ** 2)))
    print(f"VI vs NUTS posterior-mean RMS difference: {diff:.4f}"
          f" (noise level {noise})")


if __name__ == "__main__":
    main()
