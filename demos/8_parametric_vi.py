#!/usr/bin/env python
"""Parametric (black-box) variational inference: mean-field vs full
covariance (reference: ``demos/old_nifty/parametric_variational_inference.py``
and ``variational_inference_visualized.py``; classic
``src/library/variational_models.py:36,123``).

A deliberately non-Gaussian 2-D posterior (banana-shaped likelihood):
MFVI underestimates correlations; FullCovarianceVI captures them.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import jax
import jax.numpy as jnp
import numpy as np

import nifty_tpu as jft
from nifty_tpu.variational import FullCovarianceVI, MeanFieldVI


def main(seed=0):
    # Banana: d = x1^2 + x0 with tight noise -> curved correlated posterior.
    data = jnp.asarray([1.0])

    def fwd(x):
        return (x["x0"] + x["x1"] ** 2)[None]

    lh = jft.Gaussian(data, noise_std_inv=lambda x: x / 0.2).amend(
        jft.Model(
            fwd,
            domain={"x0": jft.ShapeWithDtype(()), "x1": jft.ShapeWithDtype(())},
        )
    )

    key = jax.random.PRNGKey(seed)
    k_mf, k_fc = jax.random.split(key)

    mf = MeanFieldVI(lh, n_samples=8)
    mf_params, mf_losses = mf.run(k_mf, n_steps=600)
    fc = FullCovarianceVI(lh, n_samples=8)
    fc_params, fc_losses = fc.run(k_fc, n_steps=600)
    print(f"final ELBO losses: mean-field {float(mf_losses[-1]):.3f}, "
          f"full-cov {float(fc_losses[-1]):.3f}")

    # Compare posterior samples from both approximations.
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 512)
    mf_s = jax.vmap(lambda k: mf.sample(mf_params, k))(ks)
    fc_s = jax.vmap(lambda k: fc.sample(fc_params, k))(ks)

    def corr(s):
        a, b = np.asarray(s["x0"]), np.asarray(s["x1"])
        return float(np.corrcoef(a, b)[0, 1])

    c_mf, c_fc = corr(mf_s), corr(fc_s)
    print(f"x0-x1 sample correlation: mean-field {c_mf:+.2f}, "
          f"full-cov {c_fc:+.2f}")
    # mean-field cannot represent cross-correlations by construction
    assert abs(c_mf) < 0.35
    # the full-covariance family should find the curved ridge correlation
    assert abs(c_fc) > abs(c_mf)
    # both should reproduce the data constraint on average
    pred = jax.vmap(lambda k: fwd(fc.sample(fc_params, k)))(ks)
    print("posterior predictive mean:", float(pred.mean()),
          "(data:", float(data[0]), ")")
    assert abs(float(pred.mean()) - 1.0) < 0.3
    print("parametric VI OK")


if __name__ == "__main__":
    main()
