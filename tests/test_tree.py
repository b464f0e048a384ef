"""Tests for the pytree vector calculus (ref test model:
``/root/reference/test/test_re/`` tree_math coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nifty_tpu as jft
from nifty_tpu.tree import (
    dot,
    norm,
    random_like,
    size,
    stack,
    unite,
    unstack,
    vdot,
    where,
    zeros_like,
)


def _tree(rng):
    return {
        "a": jnp.asarray(rng.normal(size=(3, 4))),
        "b": jnp.asarray(rng.normal(size=(5,))),
    }


def test_vdot_matches_concat(rng):
    t1, t2 = _tree(rng), _tree(rng)
    c1 = np.concatenate([np.ravel(t1["a"]), np.ravel(t1["b"])])
    c2 = np.concatenate([np.ravel(t2["a"]), np.ravel(t2["b"])])
    assert np.allclose(float(vdot(t1, t2)), c1 @ c2)
    assert np.allclose(float(dot(t1, t2)), c1 @ c2)


def test_vdot_complex_conjugates(rng):
    x = jnp.asarray(rng.normal(size=4) + 1j * rng.normal(size=4))
    y = jnp.asarray(rng.normal(size=4) + 1j * rng.normal(size=4))
    assert np.allclose(complex(vdot({"x": x}, {"x": y})), np.vdot(x, y))


@pytest.mark.parametrize("ord", [1, 2, jnp.inf])
def test_norm(rng, ord):
    t = _tree(rng)
    c = np.concatenate([np.ravel(t["a"]), np.ravel(t["b"])])
    assert np.allclose(float(norm(t, ord=ord)), np.linalg.norm(c, ord=ord))


def test_size_zeros_like(rng):
    t = _tree(rng)
    assert size(t) == 17
    z = zeros_like(t)
    assert all(np.all(np.asarray(l) == 0) for l in jax.tree_util.tree_leaves(z))


def test_random_like_shapes_dtypes(key):
    shapes = {
        "r": jft.ShapeWithDtype((3, 2)),
        "c": jft.ShapeWithDtype((4,), jnp.complex128),
    }
    s = random_like(key, shapes)
    assert s["r"].shape == (3, 2)
    assert s["c"].dtype == jnp.complex128
    # complex draws are unit-variance overall
    many = random_like(key, {"c": jft.ShapeWithDtype((4000,), jnp.complex128)})
    assert abs(float(jnp.mean(jnp.abs(many["c"]) ** 2)) - 1.0) < 0.1


def test_random_like_placement_independent(key):
    shapes = {"a": jft.ShapeWithDtype((8,)), "b": jft.ShapeWithDtype((8,))}
    eager = random_like(key, shapes)
    jitted = jax.jit(lambda k: random_like(k, shapes))(key)
    for k in shapes:
        assert np.allclose(eager[k], jitted[k])


def test_stack_unstack(rng):
    trees = [_tree(rng) for _ in range(3)]
    s = stack(trees)
    assert s["a"].shape == (3, 3, 4)
    u = unstack(s)
    for t, ut in zip(trees, u):
        assert np.allclose(t["a"], ut["a"])


def test_unite(rng):
    x = {"a": 1.0, "b": 2.0}
    y = {"b": 3.0, "c": 4.0}
    u = unite(x, y)
    assert u == {"a": 1.0, "b": 5.0, "c": 4.0}


def test_vector_arithmetic(rng):
    v = jft.Vector(_tree(rng))
    w = jft.Vector(_tree(rng))
    r = (2.0 * v - w / 2.0 + abs(-v)) ** 2
    ra = 2.0 * v.tree["a"] - w.tree["a"] / 2.0 + abs(-v.tree["a"])
    assert np.allclose(r.tree["a"], ra ** 2)


def test_vector_is_pytree(rng):
    v = jft.Vector(_tree(rng))
    out = jax.jit(lambda x: x + 1.0)(v)
    assert isinstance(out, jft.Vector)
    assert np.allclose(out.tree["a"], v.tree["a"] + 1.0)


def test_where_scalar_cond(rng):
    t1, t2 = _tree(rng), _tree(rng)
    r = where(jnp.asarray(True), t1, t2)
    assert np.allclose(r["a"], t1["a"])


def test_smap_lmap_match_vmap(rng):
    xs = jnp.asarray(rng.normal(size=(5, 3)))

    def f(x):
        return {"y": jnp.sin(x) @ jnp.ones(3), "z": x * 2}

    rv = jax.vmap(f)(xs)
    rs = jft.smap(f)(xs)
    rl = jft.lmap(f)(xs)
    for k in rv:
        assert np.allclose(rv[k], rs[k])
        assert np.allclose(rv[k], rl[k])


def test_smap_in_axes(rng):
    xs = jnp.asarray(rng.normal(size=(5, 3)))
    c = jnp.asarray(rng.normal(size=3))

    def f(c, x):
        return c @ x

    rv = jax.vmap(f, in_axes=(None, 0))(c, xs)
    rs = jft.smap(f, in_axes=(None, 0))(c, xs)
    assert np.allclose(rv, rs)
