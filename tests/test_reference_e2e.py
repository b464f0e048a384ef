"""End-to-end posterior parity against the reference NIFTy.re.

The BASELINE acceptance criterion: on the same synthetic data, this
framework's geoVI posterior must match the reference's within Monte-Carlo
error.  Both stacks run their own full `optimize_kl` with their own RNG;
agreement is measured in units of the posterior standard deviation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from tests.conftest import load_reference_re

pmp = pytest.mark.parametrize


def _problem(mod, dims, data):
    cfm = mod.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(dims, distances=1.0 / dims[0],
                         fluctuations=(1.0, 0.5), loglogavgslope=(-3.0, 0.2))
    cf = cfm.finalize()
    lh = mod.Gaussian(data, noise_cov_inv=lambda x: x / 0.01).amend(cf)
    return lh, cf


def test_posterior_matches_reference_within_mc_error():
    jref = load_reference_re()
    if jref is None:
        pytest.skip("reference NIFTy.re unavailable")

    dims = (24, 24)
    key = jax.random.PRNGKey(33)
    k1, k2 = jax.random.split(key)
    # Common synthetic data generated with OUR model (verified identical
    # to the reference model in test_correlated_field.py).
    lh_m, cf_m = _problem(jft, dims, jnp.zeros(dims))
    truth_pos = cf_m.init(k1)
    truth = cf_m(truth_pos)
    data = truth + 0.1 * jax.random.normal(k2, truth.shape)

    lh_m, cf_m = _problem(jft, dims, data)
    lh_r, cf_r = _problem(jref, dims, data)

    n_it, n_smpl = 6, 4
    # --- ours -----------------------------------------------------------
    samples_m, _ = jft.optimize_kl(
        lh_m, jft.random_like(jax.random.PRNGKey(1), lh_m.domain),
        key=jax.random.PRNGKey(2), n_total_iterations=n_it,
        n_samples=n_smpl,
        draw_linear_kwargs=dict(cg_kwargs=dict(absdelta=1e-11, maxiter=100)),
        kl_kwargs=dict(minimize_kwargs=dict(absdelta=1e-10, maxiter=25)),
        sample_mode="linear_resample",
    )
    mean_m, std_m = jft.mean_and_std([cf_m(s) for s in samples_m])

    # --- reference ------------------------------------------------------
    pos_r = jref.Vector({
        k: jnp.asarray(np.asarray(v)) for k, v in
        jft.random_like(jax.random.PRNGKey(1), dict(lh_r.domain)).items()
    })
    samples_r, _ = jref.optimize_kl(
        lh_r, pos_r, key=jax.random.PRNGKey(5), n_total_iterations=n_it,
        n_samples=n_smpl,
        draw_linear_kwargs=dict(
            cg_name=None, cg_kwargs=dict(absdelta=1e-11, maxiter=100)
        ),
        kl_kwargs=dict(minimize_kwargs=dict(
            name=None, absdelta=1e-10, maxiter=25, cg_kwargs=dict(name=None)
        )),
        sample_mode="linear_resample",
        odir=None,
    )
    fields_r = np.stack([np.asarray(cf_r(s)) for s in samples_r])
    mean_r, std_r = fields_r.mean(0), fields_r.std(0, ddof=1)

    # Agreement within Monte-Carlo error of the sample means:
    # std of the mean ~ std / sqrt(2 n_samples); allow 4 sigma + floor.
    std = np.maximum(np.asarray(std_m), std_r)
    mc = 4.0 * std / np.sqrt(2 * n_smpl) + 0.02
    frac_bad = np.mean(np.abs(np.asarray(mean_m) - mean_r) > mc)
    assert frac_bad < 0.05, frac_bad
    # Both recover the truth at the noise level.
    for mean in (np.asarray(mean_m), mean_r):
        rms = float(np.sqrt(np.mean((mean - np.asarray(truth)) ** 2)))
        assert rms < 0.2
