#!/usr/bin/env python
"""Spherical correlated-field inference on a HEALPix sky at scale.

A log-normal all-sky field (nside=256, lmax=511 → 786k pixels) with a
non-parametric angular power spectrum, observed under inhomogeneous
Gaussian noise, inferred with geoVI.  The harmonic transform is the
TPU-native HEALPix SHT (ring-Legendre matmul synthesis,
ops/healpix_sht.py) — the capability the reference gets from ducc's
``sharpjob_d`` (``src/operators/harmonic_operators.py:265``).

Prints a samples/s figure for the fused VI iteration; run with
``--small`` for a quick CPU smoke test (nside=32).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft


def main():
    small = "--small" in sys.argv
    nside = 32 if small else 256
    lmax = 2 * nside - 1
    key = jax.random.PRNGKey(33)

    cfm = jft.CorrelatedFieldMaker("sky")
    cfm.set_amplitude_total_offset(offset_mean=0.0, offset_std=(3e-1, 1e-1))
    # `shape` = lmax for spherical grids (nside = (lmax+1)/2); power lives
    # on multipoles l.
    cfm.add_fluctuations(
        lmax, distances=1.0, harmonic_type="healpix",
        fluctuations=(1.0, 5e-1),
        loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
    )
    sky = cfm.finalize()

    key, sk = jax.random.split(key)
    truth_pos = sky.init(sk)
    # jcall: model rides as a jit ARGUMENT so the ~GB-scale SHT tables
    # (Model.consts) enter as runtime buffers, not baked HLO constants
    truth = sky.jcall(truth_pos)

    # Inhomogeneous noise: the "galactic plane" rings are 5x noisier.
    npix = truth.shape[0]
    ring = np.abs(np.arange(npix) / npix - 0.5)
    noise_std = jnp.asarray(np.where(ring < 0.1, 0.5, 0.1))
    key, sk = jax.random.split(key)
    data = truth + noise_std * jax.random.normal(sk, truth.shape)
    lh = jft.Gaussian(
        data, noise_cov_inv=lambda x: x / noise_std**2
    ).amend(sky)

    n_iters = 2 if small else 4
    n_samples = 2 if small else 4
    key, sk = jax.random.split(key)
    t0 = time.perf_counter()
    samples, state = jft.optimize_kl(
        lh,
        jax.tree_util.tree_map(lambda x: 0.1 * x, lh.init(sk)),
        key=key,
        n_total_iterations=n_iters,
        n_samples=n_samples,
        # At nside=256 the synthesis transients are npix-scale: the
        # scan-over-samples path bounds peak memory to one sample's
        # solver state (the latent count alone would not trigger the
        # auto-smap threshold).
        residual_map="vmap" if small else "smap",
        kl_map="vmap" if small else "smap",
        draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=60)),
        nonlinearly_update_kwargs=dict(
            minimize_kwargs=dict(xtol=1e-3, maxiter=3,
                                 cg_kwargs=dict(maxiter=25))
        ),
        kl_kwargs=dict(minimize_kwargs=dict(
            xtol=1e-4, maxiter=8, cg_kwargs=dict(maxiter=40))),
        sample_mode="nonlinear_resample",
        # The one-program fused iteration faults the TPU worker at this
        # scale (the >4M-element defect class, docs/perf.md); staged
        # per-stage programs keep every dispatch within measured-good
        # territory.
        fused=False if not small else "auto",
        odir=None,
    )
    dt = time.perf_counter() - t0
    post_mean = jnp.mean(
        jnp.stack([sky.jcall(s) for s in samples]), axis=0
    )
    err = float(jnp.mean((post_mean - truth) ** 2) ** 0.5)
    prior_rms = float(jnp.std(truth))
    print(
        f"nside={nside} lmax={lmax} npix={npix}: {n_iters} geoVI iters in "
        f"{dt:.1f} s ({2 * n_samples * n_iters / dt:.3f} samples/s), "
        f"posterior-mean RMSE {err:.3f} vs prior RMS {prior_rms:.3f}"
    )
    assert err < prior_rms, "posterior mean no better than prior"


if __name__ == "__main__":
    main()
