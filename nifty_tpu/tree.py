"""Pytree-as-vector calculus.

This is the data layer of the framework: every latent position, sample, and
data object is a plain JAX pytree (usually a dict of arrays).  All vector
operations (dot products, norms, arithmetic) are defined over trees via
``tree_map``/``tree_reduce`` so that they are jit-, vmap-, and
sharding-transparent.  A thin :class:`Vector` wrapper provides operator
overloading for user convenience.

Capability parity with the reference's ``src/re/tree_math/``
(``vector.py:76`` Vector, ``vector_math.py:18`` ShapeWithDtype,
``vector_math.py:176-300`` dot/vdot/norm/..., ``forest_math.py:40``
random_like, ``forest_math.py:115`` get_map) — re-implemented from scratch
on top of ``jax.ShapeDtypeStruct`` and modern ``jax.tree_util``.
"""

from __future__ import annotations

import operator
from functools import partial, reduce
from typing import Any, Callable, Tuple, Union

import jax
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.tree_util import (
    register_pytree_node_class,
    tree_leaves,
    tree_map,
    tree_reduce,
    tree_structure,
    tree_transpose,
    tree_unflatten,
)

from . import config

# --------------------------------------------------------------------------
# Shape/dtype descriptors
# --------------------------------------------------------------------------


class ShapeWithDtype(jax.ShapeDtypeStruct):
    """Shape+dtype leaf descriptor; a ``jax.ShapeDtypeStruct`` with a default
    dtype taken from the global precision policy.

    Parity: reference ``src/re/tree_math/vector_math.py:18``.  Unlike the
    reference this *is* a ``ShapeDtypeStruct`` and thus directly usable with
    ``jax.eval_shape``/``jax.linear_transpose``.
    """

    def __init__(self, shape=(), dtype=None):
        if isinstance(shape, int):
            shape = (shape,)
        super().__init__(tuple(shape), dtype if dtype is not None else config.default_float_dtype())

    @classmethod
    def from_leave(cls, element):
        return cls(jnp.shape(element), _get_dtype(element))

    @property
    def size(self):
        return int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1


def _get_dtype(v: Any):
    if hasattr(v, "dtype"):
        return v.dtype
    return np.result_type(v)


def shape_dtype_like(tree):
    """Map a pytree of arrays to a pytree of :class:`ShapeWithDtype`."""
    return tree_map(ShapeWithDtype.from_leave, tree)


# --------------------------------------------------------------------------
# Vector wrapper (user-facing arithmetic over dict-like latent spaces)
# --------------------------------------------------------------------------

CORE_ARITHMETIC_ATTRIBUTES = (
    "__neg__", "__pos__", "__abs__", "__add__", "__radd__", "__sub__",
    "__rsub__", "__mul__", "__rmul__", "__truediv__", "__rtruediv__",
    "__floordiv__", "__rfloordiv__", "__pow__", "__rpow__", "__mod__",
    "__rmod__", "__matmul__", "__rmatmul__",
)


def has_arithmetics(obj, additional_attributes=()) -> bool:
    attrs = CORE_ARITHMETIC_ATTRIBUTES + tuple(additional_attributes)
    return all(hasattr(obj, a) for a in attrs)


def assert_arithmetics(obj, *args, **kwargs):
    if isinstance(obj, (dict,)) or not has_arithmetics(obj, *args, **kwargs):
        if isinstance(obj, dict):
            raise AssertionError(
                "plain dict does not support arithmetic; wrap it in `Vector`"
            )
        raise AssertionError(
            f"input of type {type(obj)} does not support core arithmetics;"
            " maybe wrap it in a `Vector`"
        )


def _broadcast_binary(op):
    def binary(self, other):
        if isinstance(other, Vector):
            return Vector(tree_map(op, self.tree, other.tree))
        return Vector(tree_map(lambda x: op(x, other), self.tree))

    return binary


def _broadcast_rbinary(op):
    def rbinary(self, other):
        if isinstance(other, Vector):
            return Vector(tree_map(lambda a, b: op(b, a), self.tree, other.tree))
        return Vector(tree_map(lambda x: op(other, x), self.tree))

    return rbinary


@register_pytree_node_class
class Vector:
    """Pytree wrapper lifting elementwise arithmetic to arbitrary trees.

    Parity: reference ``src/re/tree_math/vector.py:76``.
    """

    def __init__(self, tree):
        self._tree = tree

    @property
    def tree(self):
        return self._tree

    def tree_flatten(self):
        return ((self._tree,), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(children[0])

    # container protocol --------------------------------------------------
    def __getitem__(self, key):
        return self._tree[key]

    def __contains__(self, key):
        return key in self._tree

    def __len__(self):
        return len(self._tree)

    def __iter__(self):
        return iter(self._tree)

    def keys(self):
        return self._tree.keys()

    def values(self):
        return self._tree.values()

    def items(self):
        return self._tree.items()

    # arithmetic ----------------------------------------------------------
    __add__ = _broadcast_binary(operator.add)
    __radd__ = _broadcast_rbinary(operator.add)
    __sub__ = _broadcast_binary(operator.sub)
    __rsub__ = _broadcast_rbinary(operator.sub)
    __mul__ = _broadcast_binary(operator.mul)
    __rmul__ = _broadcast_rbinary(operator.mul)
    __truediv__ = _broadcast_binary(operator.truediv)
    __rtruediv__ = _broadcast_rbinary(operator.truediv)
    __floordiv__ = _broadcast_binary(operator.floordiv)
    __rfloordiv__ = _broadcast_rbinary(operator.floordiv)
    __pow__ = _broadcast_binary(operator.pow)
    __rpow__ = _broadcast_rbinary(operator.pow)
    __mod__ = _broadcast_binary(operator.mod)
    __rmod__ = _broadcast_rbinary(operator.mod)
    __matmul__ = _broadcast_binary(operator.matmul)
    __rmatmul__ = _broadcast_rbinary(operator.matmul)

    def __neg__(self):
        return Vector(tree_map(operator.neg, self._tree))

    def __pos__(self):
        return self

    def __abs__(self):
        return Vector(tree_map(operator.abs, self._tree))

    def __repr__(self):
        return f"Vector({self._tree!r})"

    def __eq__(self, other):
        if not isinstance(other, Vector):
            return False
        return tree_map(operator.eq, self._tree, other.tree)

    def __hash__(self):
        return hash(tree_structure(self))

    @property
    def shape(self):
        return tree_map(jnp.shape, self._tree)

    @property
    def size(self):
        return size(self._tree)

    def ravel(self):
        return jnp.concatenate([jnp.ravel(x) for x in tree_leaves(self._tree)])


# --------------------------------------------------------------------------
# Tree vector math (works on raw pytrees, including Vector)
# --------------------------------------------------------------------------


def tree_add(a, b):
    return tree_map(jnp.add, a, b)


def tree_sub(a, b):
    return tree_map(jnp.subtract, a, b)


def tree_scale(a, c):
    """Scale every leaf of ``a`` by scalar ``c`` (traced or static)."""
    return tree_map(lambda x: x * c, a)


def det_barrier(val):
    """Fusion barrier active only under ``deterministic_reductions``.

    Cross-mesh bitwise reproducibility of the iterative solvers requires
    more than fixed reduction association: XLA fuses the *same* math
    differently in different program contexts (notably around loop-carry
    boundaries), and fusion changes FMA contraction — ~1-ulp differences
    that data-dependent stopping branches then amplify.  Routing each
    solver stage's outputs through ``lax.optimization_barrier`` pins the
    fusion boundaries to the stage granularity, at which the computations
    are measured bitwise across meshes.  A no-op (identity, zero cost)
    when the flag is off."""
    if not config.get("deterministic_reductions"):
        return val
    return jax.lax.optimization_barrier(val)


def tree_axpy(c, x, y):
    """``y + c * x`` leafwise with a (possibly traced) scalar ``c``."""
    return tree_map(lambda xe, ye: ye + c * xe, x, y)


def _fold_halving_sum(z):
    """Scalar sum with a *fixed* association order (a function of the shape
    only, never of the device mesh): trailing axes are reduced locally
    per-row, then the leading (possibly mesh-sharded) axis is folded in
    half repeatedly.  Enables bitwise-reproducible solver scalars across
    mesh extents (cf. the reference's deterministic MPI allreduce,
    ``src/utilities.py:332-339``)."""
    z = jnp.asarray(z)
    if z.ndim == 0:
        return z
    if z.ndim > 1:
        z = jnp.sum(z, axis=tuple(range(1, z.ndim)))
    n = z.shape[0]
    while n > 1:
        m = n // 2
        folded = z[:m] + z[m : 2 * m]
        if n % 2:
            folded = jnp.concatenate([folded, z[2 * m :]])
        z = folded
        n = z.shape[0]
    return z[0]


def vdot(a, b, *, precision=None):
    """Tree-wide ``sum_i conj(a_i) * b_i`` reduced to a scalar.

    On TPU the leaf-level reduction uses ``jnp.vdot`` with HIGHEST precision
    by default so f32 CG scalars do not lose accuracy to bf16 MXU passes —
    the TPU-native analog of the reference's ducc f64 ``vdot``
    (``src/ducc_dispatch.py:81-86``).  With the global
    ``deterministic_reductions`` config flag the reduction association is
    fixed (mesh-independent), trading a little speed for cross-mesh
    bitwise reproducibility.
    """
    if config.get("deterministic_reductions"):
        def leaf_vdot_det(x, y):
            return _fold_halving_sum(jnp.conj(x) * y)

        return tree_reduce(operator.add, tree_map(leaf_vdot_det, a, b), 0.0)

    precision = jax.lax.Precision.HIGHEST if precision is None else precision

    def leaf_vdot(x, y):
        return jnp.vdot(x, y, precision=precision)

    return tree_reduce(operator.add, tree_map(leaf_vdot, a, b), 0.0)


def dot(a, b, *, precision=None):
    """Tree-wide dot product without complex conjugation."""
    precision = jax.lax.Precision.HIGHEST if precision is None else precision

    def leaf_dot(x, y):
        return jnp.dot(jnp.ravel(x), jnp.ravel(y), precision=precision)

    return tree_reduce(operator.add, tree_map(leaf_dot, a, b), 0.0)


def norm(tree, ord=2, *, ravel=False):
    """Tree-wide vector norm of order ``ord``."""
    if ravel or ord not in (1, 2, jnp.inf):
        def leaf_norm(x):
            return jnp.linalg.norm(jnp.ravel(x), ord=ord) ** ord

        acc = tree_reduce(operator.add, tree_map(leaf_norm, tree), 0.0)
        return acc ** (1.0 / ord)
    if ord == 2:
        return jnp.sqrt(vdot(tree, tree).real)
    if ord == 1:
        if config.get("deterministic_reductions"):
            return tree_reduce(
                operator.add,
                tree_map(lambda x: _fold_halving_sum(jnp.abs(x)), tree),
                0.0,
            )
        return tree_reduce(
            operator.add, tree_map(lambda x: jnp.sum(jnp.abs(x)), tree), 0.0
        )
    return tree_reduce(
        jnp.maximum, tree_map(lambda x: jnp.max(jnp.abs(x)), tree), 0.0
    )


def size(tree) -> int:
    return sum(np.size(x) for x in tree_leaves(tree))


def tsum(tree):
    return tree_reduce(operator.add, tree_map(jnp.sum, tree), 0.0)


def result_type(tree):
    leaves = tree_leaves(tree)
    if not leaves:
        return config.default_float_dtype()
    return jnp.result_type(*(_get_dtype(l) for l in leaves))


def zeros_like(tree):
    return tree_map(
        lambda x: jnp.zeros(jnp.shape(x) if not hasattr(x, "shape") else x.shape,
                            dtype=_get_dtype(x)),
        tree,
    )


def ones_like(tree):
    return tree_map(lambda x: jnp.ones(jnp.shape(x), dtype=_get_dtype(x)), tree)


def conj(tree):
    return tree_map(jnp.conj, tree)


def where(cond, a, b):
    """Leafwise select; ``cond`` may be a scalar or a matching tree."""
    if isinstance(cond, (bool, np.bool_)) or (
        hasattr(cond, "ndim") and cond.ndim == 0
    ) or not isinstance(cond, type(a)):
        return tree_map(lambda x, y: jnp.where(cond, x, y), a, b)
    return tree_map(jnp.where, cond, a, b)


def stack(trees, axis=0):
    return tree_map(lambda *el: jnp.stack(el, axis=axis), *trees)


def unstack(tree, axis=0):
    n = tree_leaves(tree)[0].shape[axis]
    split = partial(jnp.split, indices_or_sections=n, axis=axis)
    t = tree_transpose(
        tree_structure(tree), tree_structure((0.0,) * n), tree_map(split, tree)
    )
    return tree_map(partial(jnp.squeeze, axis=axis), t)


def unite(x, y, op=operator.add):
    """Key-wise union of two dict-like trees, combining shared keys via op.

    Parity: reference ``src/re/tree_math/forest_math.py:56``.
    """
    if isinstance(x, Vector) or isinstance(y, Vector):
        x = x.tree if isinstance(x, Vector) else x
        y = y.tree if isinstance(y, Vector) else y
        return Vector(unite(x, y, op=op))
    if not hasattr(x, "keys") and not hasattr(y, "keys"):
        return op(x, y)
    out = {}
    for k in set(x.keys()) | set(y.keys()):
        if k in x and k in y:
            out[k] = op(x[k], y[k])
        elif k in x:
            out[k] = x[k]
        else:
            out[k] = y[k]
    return out


def mean(trees):
    """Mean over a list of trees (or a stacked tree along axis 0)."""
    if isinstance(trees, (list, tuple)):
        n = len(trees)
        acc = trees[0]
        for t in trees[1:]:
            acc = tree_add(acc, t)
        return tree_scale(acc, 1.0 / n)
    return tree_map(partial(jnp.mean, axis=0), trees)


def mean_and_std(trees, correct_bias=True):
    if isinstance(trees, (list, tuple)):
        trees = stack(trees)
    m = tree_map(partial(jnp.mean, axis=0), trees)
    s = tree_map(partial(jnp.std, axis=0, ddof=1 if correct_bias else 0), trees)
    return m, s


# --------------------------------------------------------------------------
# Random numbers
# --------------------------------------------------------------------------


def random_like(key, primals, rng: Callable = random.normal):
    """Draw leafwise i.i.d. samples shaped like ``primals``.

    The key is split across leaves deterministically so results are
    independent of device placement and mesh size — the TPU-native
    replacement for the reference's global-index SeedSequence scheme
    (``src/random.py:53-77``; re twin ``src/re/tree_math/forest_math.py:40``).
    """
    struct = tree_structure(primals)
    subkeys = tree_unflatten(struct, list(random.split(key, struct.num_leaves)))

    def draw(k, x):
        shp = x.shape if hasattr(x, "shape") else jnp.shape(x)
        dtp = _get_dtype(x)
        if jnp.issubdtype(dtp, jnp.complexfloating):
            kr, ki = random.split(k)
            rdt = jnp.finfo(dtp).dtype
            re = rng(key=kr, shape=shp, dtype=rdt)
            im = rng(key=ki, shape=shp, dtype=rdt)
            return ((re + 1j * im) / jnp.sqrt(2.0)).astype(dtp)
        return rng(key=k, shape=shp, dtype=dtp)

    return tree_map(draw, subkeys, primals)


# --------------------------------------------------------------------------
# Map registry
# --------------------------------------------------------------------------


def get_map(map) -> Callable:
    """Resolve a map specifier to a callable.

    Supported: "vmap"/"v" (vectorized), "pmap"/"p", "smap"/"s" (scan-based
    sequential map, memory-frugal), "lmap"/"l" (python-loop map), or any
    callable.  Parity: ``src/re/tree_math/forest_math.py:115-135``.
    """
    from .custom_map import lmap, smap

    if isinstance(map, str):
        m = {
            "vmap": jax.vmap, "v": jax.vmap,
            "pmap": jax.pmap, "p": jax.pmap,
            "smap": smap, "s": smap,
            "lmap": lmap, "l": lmap,
        }.get(map)
        if m is None:
            raise ValueError(f"unknown map {map!r}")
        return m
    if callable(map):
        return map
    raise TypeError(f"invalid map {map!r}")
