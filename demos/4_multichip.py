#!/usr/bin/env python
"""Mesh-parallel geoVI: samples (dp) × field (sp) sharding.

Runs on any device count — e.g. locally with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
— and unchanged on a TPU pod slice (add
``jft.parallel.initialize_distributed(...)`` on multi-host).

The correlated field uses the pencil-decomposed distributed Hartley
transform over the "field" mesh axis; antithetic sample draws ride the
"samples" axis; KL mean-reductions become all-reduces over ICI.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import nifty_tpu as jft
from nifty_tpu.evi import draw_linear_residual
from nifty_tpu.optimize_kl import _kl_met, _kl_vg, concatenate_zip
from nifty_tpu.ops.distributed_fft import distributed_hartley
from nifty_tpu.parallel import make_mesh
from nifty_tpu.solvers.newton_cg import _newton_cg


def main(n_iterations: int = 4):
    n_dev = len(jax.devices())
    n_s = 2 if n_dev % 2 == 0 and n_dev >= 2 else 1
    n_f = n_dev // n_s
    mesh = make_mesh(samples=n_s, field=n_f)
    print(f"mesh: samples={n_s} x field={n_f}")

    dims = (32 * n_f, 32)
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(dims, 1.0 / dims[0], (1.0, 0.5), (-3.0, 0.2))
    cf = cfm.finalize(
        hartley_fn=lambda x, axes=None: distributed_hartley(x, mesh, "field")
    )

    key = jax.random.PRNGKey(0)
    key, k1, k2 = jax.random.split(key, 3)
    truth = cf(cf.init(k1))
    noise = 0.1
    data = truth + noise * jax.random.normal(k2, truth.shape)
    lh = jft.Gaussian(data, lambda x: x / noise ** 2).amend(cf)

    def put_field(x):
        if jnp.ndim(x) >= 2 and x.shape[0] % n_f == 0:
            return jax.device_put(
                x, NamedSharding(mesh, P(*(["field"] + [None] * (jnp.ndim(x) - 1))))
            )
        return x

    lh = jax.tree_util.tree_map(put_field, lh)
    pos = jax.tree_util.tree_map(put_field, jft.random_like(key, lh.domain))

    @jax.jit
    def vi_step(lh, pos, keys):
        draw = jax.vmap(
            lambda k: draw_linear_residual(
                lh, pos, k, cg_kwargs=dict(maxiter=40)
            )[0]
        )
        resid = draw(keys)
        neg = jax.tree_util.tree_map(jnp.negative, resid)
        samples = jft.Samples(
            pos=pos, samples=concatenate_zip(resid, neg), keys=keys
        )
        res = _newton_cg(
            None, x0=pos,
            fun_and_grad=partial(_kl_vg, lh, primals_samples=samples),
            hessp=partial(_kl_met, lh, primals_samples=samples),
            maxiter=10, xtol=1e-4, cg_kwargs=dict(maxiter=20),
        )
        return res.x, res.fun

    for it in range(n_iterations):
        key, sk = jax.random.split(key)
        keys = jax.device_put(
            jax.random.split(sk, max(n_s, 2)), NamedSharding(mesh, P("samples"))
        )
        pos, energy = vi_step(lh, pos, keys)
        print(f"iteration {it}: KL energy {float(energy):.4e}")

    pm = cf(pos)
    rms = float(jnp.sqrt(jnp.mean((pm - truth) ** 2)))
    print(f"posterior-mode RMS error {rms:.4f} (noise {noise})")


if __name__ == "__main__":
    main()
