"""Mesh-parallelism tests on an 8-virtual-device CPU mesh.

Translation of the reference's MPI test strategy (``test/test_mpi/``):
identical results independent of the mesh layout, deterministic
reductions, and the distributed FFT matching the local one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import nifty_tpu as jft
from nifty_tpu.ops.distributed_fft import distributed_fftn, distributed_hartley
from nifty_tpu.ops.harmonic import hartley_via_c2c
from nifty_tpu.parallel import (
    make_mesh,
    pairwise_mean,
    pairwise_sum,
    shard_samples,
    tree_pairwise_mean,
)

pmp = pytest.mark.parametrize


def _field_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("field",))


@pmp("shape", [(16, 12), (8, 6, 4), (32,)])
@pmp("n_dev", [2, 4])
def test_distributed_hartley_matches_local(rng, shape, n_dev):
    mesh = _field_mesh(n_dev)
    x = jnp.asarray(rng.normal(size=shape))
    xs = jax.device_put(
        x, NamedSharding(mesh, P(*(["field"] + [None] * (x.ndim - 1))))
    )
    np.testing.assert_allclose(
        distributed_hartley(xs, mesh), hartley_via_c2c(x), rtol=1e-10,
        atol=1e-10,
    )


@pmp("n_dev", [2, 4])
def test_distributed_fftn_matches_local(rng, n_dev):
    mesh = _field_mesh(n_dev)
    x = jnp.asarray(rng.normal(size=(16, 8)) + 1j * rng.normal(size=(16, 8)))
    xs = jax.device_put(x, NamedSharding(mesh, P("field", None)))
    np.testing.assert_allclose(
        distributed_fftn(xs, mesh), jnp.fft.fftn(x), rtol=1e-10, atol=1e-10
    )


def test_distributed_hartley_adjoint(rng):
    mesh = _field_mesh(4)
    x = jnp.asarray(rng.normal(size=(16, 12)))
    y = jnp.asarray(rng.normal(size=(16, 12)))
    xs = jax.device_put(x, NamedSharding(mesh, P("field", None)))
    g = jax.grad(lambda v: jnp.vdot(distributed_hartley(v, mesh), y))(xs)
    np.testing.assert_allclose(g, hartley_via_c2c(y), rtol=1e-10, atol=1e-10)


def test_pairwise_sum_mesh_size_independent(rng):
    """The fixed-order reduction is bitwise independent of sharding."""
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    r_unsharded = pairwise_sum(x)
    for n in (2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), ("s",))
        xs = jax.device_put(x, NamedSharding(mesh, P("s", None)))
        r = jax.jit(pairwise_sum)(xs)
        np.testing.assert_array_equal(np.asarray(r), np.asarray(r_unsharded))


def test_pairwise_sum_matches_sum(rng):
    for n in (1, 2, 3, 5, 8, 13):
        x = jnp.asarray(rng.normal(size=(n, 4)))
        np.testing.assert_allclose(pairwise_sum(x), x.sum(0), rtol=1e-12)
        np.testing.assert_allclose(pairwise_mean(x), x.mean(0), rtol=1e-12)


def test_sharded_kl_step_matches_single_device(rng, key):
    """The full VI sample draw + KL grad is identical (within fp tolerance)
    with and without mesh sharding — the analog of the reference's
    '1 rank == 2 ranks' MPI tests."""
    from nifty_tpu.evi import draw_linear_residual
    from nifty_tpu.optimize_kl import _kl_vg, concatenate_zip

    dims = (16, 16)
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(dims, 1.0 / 16, (1.0, 0.5), (-2.0, 0.5))
    cf = cfm.finalize()
    data = jnp.asarray(rng.normal(size=dims))
    lh = jft.Gaussian(data).amend(cf)
    pos = jft.random_like(key, lh.domain)
    keys = jax.random.split(jax.random.PRNGKey(2), 4)

    def draw_and_grad(lh, pos, keys):
        draw = jax.vmap(
            lambda k: draw_linear_residual(
                lh, pos, k, cg_kwargs=dict(resnorm=1e-9, maxiter=50)
            )[0]
        )
        resid = draw(keys)
        neg = jax.tree_util.tree_map(jnp.negative, resid)
        samples = jft.Samples(
            pos=pos, samples=concatenate_zip(resid, neg), keys=keys
        )
        return _kl_vg(lh, pos, samples)

    v0, g0 = jax.jit(draw_and_grad)(lh, pos, keys)

    mesh = make_mesh(samples=2, field=1)
    keys_sh = jax.device_put(keys, NamedSharding(mesh, P("samples")))
    pos_sh = jax.device_put(pos, NamedSharding(mesh, P()))
    v1, g1 = jax.jit(draw_and_grad)(lh, pos_sh, keys_sh)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)


def test_shard_samples_roundtrip(rng, key):
    mesh = make_mesh(samples=2, field=4)
    pos = {"xi": jnp.asarray(rng.normal(size=(8, 8))),
           "s": jnp.asarray(0.3)}
    resid = {"xi": jnp.asarray(rng.normal(size=(4, 8, 8))),
             "s": jnp.asarray(rng.normal(size=(4,)))}
    s = jft.Samples(pos=pos, samples=resid, keys=None)
    ss = shard_samples(s, mesh)
    np.testing.assert_allclose(np.asarray(ss[1]["xi"]), np.asarray(s[1]["xi"]))
    # sharding placed on the right axes
    sh = ss._samples["xi"].sharding
    assert sh.spec[0] == "samples"


def test_kl_with_pairwise_reduce_mesh_independent(rng, key):
    """The deterministic pairwise reduce removes the reduction-order
    dependence of the KL value/grad across mesh sizes; what remains is
    ulp-level layout-dependent rounding inside per-sample kernels."""
    from nifty_tpu.optimize_kl import _kl_vg, concatenate_zip
    from nifty_tpu.evi import draw_linear_residual

    dims = (8, 8)
    cfm = jft.CorrelatedFieldMaker("cf")
    cfm.set_amplitude_total_offset(offset_mean=0.5, offset_std=(1e-1, 3e-2))
    cfm.add_fluctuations(dims, 1.0 / 8, (1.0, 0.5), (-2.0, 0.5))
    cf = cfm.finalize()
    lh = jft.Gaussian(jnp.asarray(rng.normal(size=dims))).amend(cf)
    pos = jft.random_like(key, lh.domain)
    keys = jax.random.split(jax.random.PRNGKey(5), 8)

    def vg(lh, pos, keys):
        draw = jax.vmap(lambda k: draw_linear_residual(
            lh, pos, k, cg_kwargs=dict(resnorm=1e-6, maxiter=30))[0])
        resid = draw(keys)
        neg = jax.tree_util.tree_map(jnp.negative, resid)
        samples = jft.Samples(pos=pos, samples=concatenate_zip(resid, neg))
        return _kl_vg(lh, pos, samples, reduce=tree_pairwise_mean)

    v0, g0 = jax.jit(vg)(lh, pos, keys)
    mesh = make_mesh(samples=8, field=1)
    keys_sh = jax.device_put(keys, NamedSharding(mesh, P("samples")))
    v1, g1 = jax.jit(vg)(lh, pos, keys_sh)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-12)
