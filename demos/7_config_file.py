#!/usr/bin/env python
"""Driving ``optimize_kl`` from an INI config file
(reference: ``demos/old_nifty/getting_started_7_config_file.py`` +
``OptimizeKLConfig``, ``src/minimization/config/optimize_kl_config.py:31``).

Demonstrates section inheritance (``base``), ``N*v`` repetition schedules,
and ``*section`` dereferencing with a builder.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp

import nifty_tpu as jft

CONFIG = """
[optimize_kl]
n_total_iterations = 4
n_samples = 1*1,3*2
draw_linear_kwargs = *cg_conservative
odir = none

[cg_base]
maxiter = 40

[cg_conservative]
base = cg_base
absdelta = 1e-5
"""


def main(dims=(64, 64), seed=11):
    import configparser

    cp = configparser.ConfigParser()
    cp.optionxform = str
    cp.read_string(CONFIG)

    def cg_builder(**kw):
        return dict(cg_kwargs=kw)

    cfg = jft.OptimizeKLConfig(
        {s: dict(cp[s]) for s in cp.sections()},
        builders={"cg_conservative": cg_builder},
    )

    # Model + synthetic data.
    cf = jft.SimpleCorrelatedField(
        dims, 1.0 / dims[0], offset_mean=0.0, offset_std=(1e-1, 1e-2),
        fluctuations=(1.0, 0.5), loglogavgslope=(-3.0, 0.5),
        flexibility=None,
    )
    key = jax.random.PRNGKey(seed)
    key, k1, k2, k3 = jax.random.split(key, 4)
    truth = cf(cf.init(k1))
    data = truth + 0.1 * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, noise_std_inv=lambda x: x / 0.1).amend(cf)

    samples, state = cfg.optimize_kl(
        lh, jft.Vector(lh.init(k3)), key=key,
    )
    resid = jnp.mean(jnp.stack([cf(s) for s in samples]), 0) - truth
    err = float(jnp.sqrt(jnp.mean(resid**2) / jnp.mean(truth**2)))
    print(f"relative reconstruction error: {err:.3f}")
    assert err < 0.5
    print("config-driven optimize_kl OK")


if __name__ == "__main__":
    main()
