"""bin_gather primitive: values and autodiff rules on every transform path.

On CPU the primitive lowers to XLA gather/segment-sum, so these tests pin
the *calculus* (JVP under ``jax.linearize``, transpose, batching) that the
TPU Pallas path shares; kernel-vs-gather numerical identity is additionally
exercised on TPU by the benchmark harness.
"""

import jax
import numpy as np
import pytest
from jax import numpy as jnp

from nifty_tpu.ops.pallas_gather import SMALL_TABLE_MAX_BINS, bin_gather

pmp = pytest.mark.parametrize


@pmp("shape", [(13,), (5, 6), (3, 4, 5)])
def test_bin_gather_value(shape):
    rng = np.random.default_rng(42)
    nb = 17
    idx = jnp.asarray(rng.integers(0, nb, shape))
    t = jnp.asarray(rng.standard_normal(nb))
    np.testing.assert_allclose(bin_gather(t, idx), t[idx])


def test_bin_gather_linearize_and_transpose():
    rng = np.random.default_rng(3)
    nb = 11
    idx = jnp.asarray(rng.integers(0, nb, (7, 5)))
    t = jnp.asarray(rng.standard_normal(nb))
    f = lambda tt: bin_gather(tt, idx)

    y, lin = jax.linearize(f, t)
    dt = jnp.asarray(rng.standard_normal(nb))
    np.testing.assert_allclose(lin(dt), dt[idx])

    ct = jnp.asarray(rng.standard_normal((7, 5)))
    (g,) = jax.linear_transpose(lin, t)(ct)
    ref = jax.ops.segment_sum(ct.ravel(), idx.ravel(), num_segments=nb)
    np.testing.assert_allclose(g, ref, rtol=1e-13)


def test_bin_gather_grad():
    rng = np.random.default_rng(4)
    nb = 9
    idx = jnp.asarray(rng.integers(0, nb, (6, 4)))
    t = jnp.asarray(rng.standard_normal(nb))
    g = jax.grad(lambda tt: (bin_gather(tt, idx) ** 2).sum())(t)
    np.testing.assert_allclose(g, 2 * t * jnp.bincount(idx.ravel(), length=nb))


def test_bin_gather_vmap_table():
    rng = np.random.default_rng(5)
    nb, B = 8, 3
    idx = jnp.asarray(rng.integers(0, nb, (5, 6)))
    tb = jnp.asarray(rng.standard_normal((B, nb)))
    out = jax.vmap(lambda tt: bin_gather(tt, idx))(tb)
    np.testing.assert_allclose(out, jnp.stack([tb[i][idx] for i in range(B)]))


def test_bin_gather_nested_vmap_and_hvp():
    rng = np.random.default_rng(6)
    nb = 8
    idx = jnp.asarray(rng.integers(0, nb, (5, 6)))
    tbb = jnp.asarray(rng.standard_normal((2, 3, nb)))
    out = jax.vmap(jax.vmap(lambda tt: bin_gather(tt, idx)))(tbb)
    assert out.shape == (2, 3, 5, 6)

    # vmap(linearize(grad)) — the CG-over-samples hessp composition
    def loss(tt):
        return (bin_gather(tt, idx) ** 2).sum()

    tb = tbb[0]
    hv = jax.jit(
        jax.vmap(lambda tt, v: jax.jvp(jax.grad(loss), (tt,), (v,))[1])
    )(tb, tb)
    expect = 2 * tb * jnp.bincount(idx.ravel(), length=nb)[None]
    np.testing.assert_allclose(hv, expect, rtol=1e-12)


def test_bin_gather_vmap_idx():
    rng = np.random.default_rng(7)
    nb = 8
    t = jnp.asarray(rng.standard_normal(nb))
    idxb = jnp.asarray(rng.integers(0, nb, (4, 5)))
    out = jax.vmap(lambda ii: bin_gather(t, ii))(idxb)
    np.testing.assert_allclose(out, t[idxb])


def test_small_table_threshold_is_static():
    assert isinstance(SMALL_TABLE_MAX_BINS, int) and SMALL_TABLE_MAX_BINS >= 1024
