"""smap/lmap vs jax.vmap equivalence — the memory-knob maps.

Mirrors the intent of the reference's ``test/test_re/test_custom_map.py``:
the sequential maps must be drop-in replacements for ``vmap`` on the
``in_axes`` subset they support, over plain arrays, pytrees, multiple
arguments, and under ``jit``/``grad``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nifty_tpu.custom_map import lmap, smap

pmp = pytest.mark.parametrize
MAPS = [smap, lmap]


@pmp("m", MAPS)
def test_matches_vmap_single_arg(m, key):
    x = jax.random.normal(key, (5, 7))
    f = lambda v: jnp.sin(v) * jnp.arange(7)
    np.testing.assert_allclose(m(f)(x), jax.vmap(f)(x), rtol=1e-6)


@pmp("m", MAPS)
@pmp("in_axes", [(0, None), (None, 0), (0, 0)])
def test_in_axes_combinations(m, in_axes, key):
    k1, k2 = jax.random.split(key)
    n = 4
    a = jax.random.normal(k1, (n, 3) if in_axes[0] == 0 else (3,))
    b = jax.random.normal(k2, (n, 3) if in_axes[1] == 0 else (3,))
    f = lambda u, v: u * v + u.sum()
    got = m(f, in_axes=in_axes)(a, b)
    want = jax.vmap(f, in_axes=in_axes)(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pmp("m", MAPS)
def test_pytree_inputs_and_outputs(m, key):
    k1, k2 = jax.random.split(key)
    tree = {"a": jax.random.normal(k1, (6, 2)),
            "b": (jax.random.normal(k2, (6,)),)}

    def f(t):
        return {"s": t["a"].sum() + t["b"][0], "p": t["a"] * 2}

    got = m(f)(tree)
    want = jax.vmap(f)(tree)
    for leaf_g, leaf_w in zip(jax.tree_util.tree_leaves(got),
                              jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(leaf_g, leaf_w, rtol=1e-6)


@pmp("m", MAPS)
def test_under_jit_and_grad(m, key):
    x = jax.random.normal(key, (3, 8))

    def loss(x):
        y = m(lambda v: jnp.tanh(v).sum())(x)
        return y.sum()

    g_got = jax.jit(jax.grad(loss))(x)
    g_want = jax.grad(lambda x: jax.vmap(
        lambda v: jnp.tanh(v).sum())(x).sum())(x)
    np.testing.assert_allclose(g_got, g_want, rtol=1e-6)


def test_smap_is_scan_based_memory_knob():
    """smap must lower to a single scan: exactly one iteration of the body
    appears in the jaxpr (vs vmap's batched program)."""
    x = jnp.ones((4, 5))
    jaxpr = jax.make_jaxpr(smap(lambda v: jnp.sin(v)))(x)
    assert any(e.primitive.name == "scan" for e in jaxpr.jaxpr.eqns)


@pmp("m", MAPS)
def test_error_cases(m):
    with pytest.raises(ValueError):
        m(lambda a: a, out_axes=1)
    with pytest.raises(ValueError):
        m(lambda a, b: a + b, in_axes=(None, None))(jnp.ones(3), jnp.ones(3))
    with pytest.raises(ValueError):
        m(lambda a: a, in_axes=(0, 0))(jnp.ones((2, 3)))
    with pytest.raises(ValueError):
        m(lambda a: a, in_axes=1)(jnp.ones((2, 3)))


def test_lmap_inconsistent_sizes():
    with pytest.raises(ValueError):
        lmap(lambda a, b: a + b)(jnp.ones((2, 3)), jnp.ones((4, 3)))
