"""Likelihood calculus: energy + Fisher metric + metric square roots, all
derived from autodiff.

Every likelihood exposes

- ``energy(x)``            — the negative log-likelihood,
- ``transformation(x)``    — a coordinate map under which the Fisher metric
  is the identity (when it exists),
- ``left_sqrt_metric(x,t)``  = J_T^dagger t  (vjp of the transformation),
- ``right_sqrt_metric(x,t)`` = J_T t         (its linear transpose),
- ``metric(x,t)``          = lsm(rsm(t)),

so MGVI/geoVI sampling never materializes a covariance: metric
applications are jvp/vjp round trips through the (possibly amended)
forward model, which XLA fuses into the same FFT+pointwise kernels as the
forward pass.

Parity: reference ``src/re/likelihood.py`` (``Likelihood`` ``:184``,
``LikelihoodPartial`` ``:397``, ``LikelihoodWithModel`` ``:496``,
``LikelihoodSum`` ``:620``, point-estimate machinery ``:27-171``) —
re-implemented from scratch with a simplified flatten-based
freeze/insert mechanism.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax
from jax import numpy as jnp
from jax.tree_util import (
    Partial,
    tree_leaves,
    tree_map,
    tree_structure,
    tree_unflatten,
)

from .model import LazyModel, NoValue
from .tree import ShapeWithDtype, Vector, conj, shape_dtype_like

P = TypeVar("P")


def _functional_conj(func):
    """Conjugate a linear functional: func^*(x) = (func(x^*))^*."""

    def func_conj(*args, **kwargs):
        return conj(func(*conj(args), **conj(kwargs)))

    return func_conj


# --------------------------------------------------------------------------
# Point-estimate (freeze) machinery
# --------------------------------------------------------------------------


def parse_point_estimates(point_estimates, primals):
    """Normalize ``point_estimates`` to a boolean-leaf tree matching
    ``primals`` and split the primals into (liquid, frozen) leaf tuples.

    ``point_estimates`` may be a tuple/list of dict keys (convenience for
    dict-like primals) or a pytree of booleans congruent with ``primals``.
    Returns ``(bool_tree, liquid, frozen)`` where ``liquid`` is a
    :class:`~nifty_tpu.tree.Vector` of the non-frozen leaves and ``frozen``
    the tuple of frozen leaves.  Parity: ``src/re/likelihood.py:27``.
    """
    if isinstance(point_estimates, (tuple, list)):
        tree = primals.tree if isinstance(primals, Vector) else primals
        if not isinstance(tree, dict):
            raise TypeError(
                "tuple-shortcut point-estimates require dict-like primals"
            )
        unknown = set(point_estimates) - set(tree)
        if unknown:
            raise ValueError(f"point-estimate keys {unknown} not in primals")
        pe = {
            k: tree_map(lambda _, frz=(k in point_estimates): frz, v)
            for k, v in tree.items()
        }
        point_estimates = Vector(pe) if isinstance(primals, Vector) else pe
    if tree_structure(primals) != tree_structure(point_estimates):
        raise TypeError("`primals` and `point_estimates` structures do not match")

    liquid, frozen = [], []
    for p, is_frozen in zip(tree_leaves(primals), tree_leaves(point_estimates)):
        (frozen if is_frozen else liquid).append(p)
    return point_estimates, Vector(tuple(liquid)), tuple(frozen)


def _insert_liquid(liquid, bool_tree, frozen, primals_struct):
    """Merge liquid leaves and frozen leaves back into the full tree."""
    liquid = list(liquid.tree if isinstance(liquid, Vector) else liquid)
    frozen = list(frozen)
    leaves = [
        frozen.pop(0) if cond else liquid.pop(0)
        for cond in tree_leaves(bool_tree)
    ]
    return tree_unflatten(primals_struct, leaves)


def _extract_liquid(full, bool_tree):
    liquid = [
        l for l, cond in zip(tree_leaves(full), tree_leaves(bool_tree)) if not cond
    ]
    return Vector(tuple(liquid))


# --------------------------------------------------------------------------
# Likelihood core
# --------------------------------------------------------------------------


def _parse_lsm_shape(shape):
    leaves = tree_leaves(shape)
    if all(hasattr(e, "shape") and hasattr(e, "dtype") for e in leaves) and leaves:
        return shape
    return ShapeWithDtype(shape)


class Likelihood(LazyModel):
    """Base class; see module docstring.

    Parity: ``src/re/likelihood.py:184``.
    """

    _lsm_tan_shp: Any = None

    def __init__(self, *, domain=NoValue, init=NoValue, lsm_tangents_shape=None):
        self._lsm_tan_shp = _parse_lsm_shape(lsm_tangents_shape)
        super().__init__(domain=domain, init=init)

    def __call__(self, primals, **kw):
        return self.energy(primals, **kw)

    def energy(self, primals, **kw):
        raise NotImplementedError("`energy` is not implemented")

    def transformation(self, primals, **kw):
        raise NotImplementedError("`transformation` is not implemented")

    def normalized_residual(self, primals, **kw):
        raise NotImplementedError("`normalized_residual` is not implemented")

    def metric(self, primals, tangents, **kw):
        return self.left_sqrt_metric(
            primals, self.right_sqrt_metric(primals, tangents, **kw), **kw
        )

    def metric_at(self, primals, **kw) -> Callable:
        """Return the metric matvec with all primals-dependent work hoisted.

        Solvers that apply the metric many times at a fixed expansion
        point (CG inside MGVI sampling / Newton) should use this: the
        forward linearization (and with it e.g. amplitude gathers and
        other primals-only computations) is traced *once* and becomes a
        loop constant instead of being recomputed per matvec.
        """
        return lambda tangents: self.metric(primals, tangents, **kw)

    def left_sqrt_metric(self, primals, tangents, **kw):
        _, bwd = jax.vjp(Partial(self.transformation, **kw), primals)
        return _functional_conj(bwd)(tangents)[0]

    def right_sqrt_metric(self, primals, tangents, **kw):
        lsm_at_p = Partial(self.left_sqrt_metric, primals, **kw)
        rsm_at_p = jax.linear_transpose(lsm_at_p, self.lsm_tangents_shape)
        return _functional_conj(rsm_at_p)(tangents)[0]

    @property
    def left_sqrt_metric_tangents_shape(self):
        return self._lsm_tan_shp

    lsm_tangents_shape = left_sqrt_metric_tangents_shape

    @property
    def right_sqrt_metric_tangents_shape(self):
        return self.domain

    rsm_tangents_shape = right_sqrt_metric_tangents_shape

    def amend(self, f: Callable, /, *, domain=NoValue, likelihood_argnames=None):
        """Compose a forward model to the right of this likelihood."""
        return LikelihoodWithModel(
            self, f, domain=domain, likelihood_argnames=likelihood_argnames
        )

    def __add__(self, other):
        return LikelihoodSum(self, other)

    def freeze(self, *, primals, point_estimates):
        """Return ``(partial_likelihood, liquid_primals)`` with the
        point-estimated leaves inserted as constants."""
        if not point_estimates:
            return self, primals
        lp = LikelihoodPartial(
            self, primals=primals, point_estimates=point_estimates
        )
        return lp, lp.splitx(primals)[0]


class LikelihoodPartial(Likelihood):
    """Likelihood with some primal leaves frozen to constants.

    Liquid primals travel as a :class:`Vector` of the non-frozen leaves.
    Parity: ``src/re/likelihood.py:397``.
    """

    likelihood: Likelihood = dataclasses.field(metadata=dict(static=False))
    primals_frozen: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, likelihood, /, *, primals, point_estimates):
        self.likelihood = likelihood
        self.point_estimates, liquid, self.primals_frozen = parse_point_estimates(
            point_estimates, primals
        )
        self._primals_struct = tree_structure(primals)
        super().__init__(
            domain=shape_dtype_like(liquid),
            lsm_tangents_shape=self.likelihood.lsm_tangents_shape,
        )

    def insert(self, liquid):
        return _insert_liquid(
            liquid, self.point_estimates, self.primals_frozen, self._primals_struct
        )

    def insert_zeros(self, liquid_tangents):
        zeros = tuple(tree_map(jnp.zeros_like, f) for f in self.primals_frozen)
        return _insert_liquid(
            liquid_tangents, self.point_estimates, zeros, self._primals_struct
        )

    def remove(self, full):
        return _extract_liquid(full, self.point_estimates)

    def splitx(self, primals):
        return parse_point_estimates(self.point_estimates, primals)[1:]

    def energy(self, primals, **kw):
        return self.likelihood.energy(self.insert(primals), **kw)

    def transformation(self, primals, **kw):
        return self.likelihood.transformation(self.insert(primals), **kw)

    def normalized_residual(self, primals, **kw):
        return self.likelihood.normalized_residual(self.insert(primals), **kw)

    def metric(self, primals, tangents, **kw):
        full = self.likelihood.metric(
            self.insert(primals), self.insert_zeros(tangents), **kw
        )
        return self.remove(full)

    def metric_at(self, primals, **kw):
        inner = self.likelihood.metric_at(self.insert(primals), **kw)
        return lambda t: self.remove(inner(self.insert_zeros(t)))

    def left_sqrt_metric(self, primals, tangents, **kw):
        full = self.likelihood.left_sqrt_metric(self.insert(primals), tangents, **kw)
        return self.remove(full)

    def right_sqrt_metric(self, primals, tangents, **kw):
        return self.likelihood.right_sqrt_metric(
            self.insert(primals), self.insert_zeros(tangents), **kw
        )


class LikelihoodWithModel(Likelihood):
    """Likelihood ∘ forward-model composition.

    The metric transposes the *jvp* of the forward model (rather than
    re-computing a vjp), matching the faster formulation in the reference
    (``src/re/likelihood.py:568-576``).
    """

    likelihood: Likelihood = dataclasses.field(metadata=dict(static=False))
    forward: Callable = dataclasses.field(metadata=dict(static=False))
    likelihood_argnames: tuple = ()

    def __init__(
        self,
        likelihood: Likelihood,
        f: Callable,
        /,
        *,
        domain=NoValue,
        init=NoValue,
        likelihood_argnames=None,
    ):
        self.likelihood = likelihood
        if not callable(f):
            raise TypeError(f"forward model must be callable; got {f!r}")
        self.forward = f if isinstance(f, LazyModel) else Partial(f)
        self.likelihood_argnames = tuple(likelihood_argnames or ())
        if domain is NoValue and isinstance(f, LazyModel):
            domain = f.domain
        if init is NoValue and isinstance(f, LazyModel):
            init = f.init
        super().__init__(
            domain=domain,
            init=init,
            lsm_tangents_shape=likelihood.lsm_tangents_shape,
        )

    def _split_kwargs(self, **kw):
        left = {k: kw.pop(k) for k in self.likelihood_argnames}
        return left, kw

    def energy(self, primals, **kw):
        kl, kr = self._split_kwargs(**kw)
        return self.likelihood(self.forward(primals, **kr), **kl)

    def transformation(self, primals, **kw):
        kl, kr = self._split_kwargs(**kw)
        return self.likelihood.transformation(self.forward(primals, **kr), **kl)

    def normalized_residual(self, primals, **kw):
        kl, kr = self._split_kwargs(**kw)
        return self.likelihood.normalized_residual(self.forward(primals, **kr), **kl)

    def metric(self, primals, tangents, **kw):
        kl, kr = self._split_kwargs(**kw)
        y, fwd = jax.linearize(Partial(self.forward, **kr), primals)
        bwd = _functional_conj(jax.linear_transpose(fwd, primals))
        return bwd(self.likelihood.metric(y, fwd(tangents), **kl))[0]

    def metric_at(self, primals, **kw) -> Callable:
        kl, kr = self._split_kwargs(**kw)
        y, fwd = jax.linearize(Partial(self.forward, **kr), primals)
        bwd = _functional_conj(jax.linear_transpose(fwd, primals))
        inner = self.likelihood.metric_at(y, **kl)

        def matvec(tangents):
            return bwd(inner(fwd(tangents)))[0]

        return matvec

    def left_sqrt_metric(self, primals, tangents, **kw):
        kl, kr = self._split_kwargs(**kw)
        y, bwd = jax.vjp(Partial(self.forward, **kr), primals)
        bwd = _functional_conj(bwd)
        return bwd(self.likelihood.left_sqrt_metric(y, tangents, **kl))[0]

    def right_sqrt_metric(self, primals, tangents, **kw):
        kl, kr = self._split_kwargs(**kw)
        y, fwd = jax.linearize(Partial(self.forward, **kr), primals)
        return self.likelihood.right_sqrt_metric(y, fwd(tangents), **kl)

    def amend(self, f: Callable, *, domain=NoValue, left_argnames=None,
              likelihood_argnames=None):
        left_argnames = tuple(left_argnames or ())
        if domain is NoValue and isinstance(f, LazyModel):
            domain = f.domain
        la = (
            self.likelihood_argnames
            if likelihood_argnames is None else likelihood_argnames
        )
        outer = self.forward

        def chained(primals, **kw):
            kl = {k: kw.pop(k) for k in left_argnames}
            return outer(f(primals, **kw), **kl)

        return LikelihoodWithModel(
            self.likelihood, chained, domain=domain, likelihood_argnames=la
        )


class LikelihoodSum(Likelihood):
    """Sum of two likelihoods over a shared (united) latent domain.

    Data-space trees of the two summands are kept apart under the keys
    ``lh_left``/``lh_right``.  Parity: ``src/re/likelihood.py:620``.
    """

    left_likelihood: Likelihood = dataclasses.field(metadata=dict(static=False))
    right_likelihood: Likelihood = dataclasses.field(metadata=dict(static=False))

    def __init__(self, left, right, /, domain=NoValue, init=NoValue,
                 _left_key="lh_left", _right_key="lh_right"):
        if not (isinstance(left, Likelihood) and isinstance(right, Likelihood)):
            raise TypeError("both summands must be Likelihoods")
        self._lkey, self._rkey = _left_key, _right_key
        joined_shape = {
            _left_key: left.lsm_tangents_shape,
            _right_key: right.lsm_tangents_shape,
        }
        if domain is NoValue and left.domain is not NoValue and right.domain is not NoValue:
            lvec = isinstance(left.domain, Vector)
            rvec = isinstance(right.domain, Vector)
            ld = left.domain.tree if lvec else left.domain
            rd = right.domain.tree if rvec else right.domain
            domain = {**ld, **rd}
            domain = Vector(domain) if lvec or rvec else domain
        self.left_likelihood = left
        self.right_likelihood = right
        super().__init__(domain=domain, init=init, lsm_tangents_shape=joined_shape)

    def energy(self, primals, **kw):
        return self.left_likelihood.energy(primals, **kw) + \
            self.right_likelihood.energy(primals, **kw)

    def transformation(self, primals, **kw):
        return {
            self._lkey: self.left_likelihood.transformation(primals, **kw),
            self._rkey: self.right_likelihood.transformation(primals, **kw),
        }

    def normalized_residual(self, primals, **kw):
        return {
            self._lkey: self.left_likelihood.normalized_residual(primals, **kw),
            self._rkey: self.right_likelihood.normalized_residual(primals, **kw),
        }

    def metric(self, primals, tangents, **kw):
        lm = self.left_likelihood.metric(primals, tangents, **kw)
        rm = self.right_likelihood.metric(primals, tangents, **kw)
        return tree_map(jnp.add, lm, rm)

    def metric_at(self, primals, **kw):
        lm = self.left_likelihood.metric_at(primals, **kw)
        rm = self.right_likelihood.metric_at(primals, **kw)
        return lambda t: tree_map(jnp.add, lm(t), rm(t))

    def left_sqrt_metric(self, primals, tangents, **kw):
        ll = self.left_likelihood.left_sqrt_metric(
            primals, tangents[self._lkey], **kw
        )
        rl = self.right_likelihood.left_sqrt_metric(
            primals, tangents[self._rkey], **kw
        )
        return tree_map(jnp.add, ll, rl)

    def right_sqrt_metric(self, primals, tangents, **kw):
        return {
            self._lkey: self.left_likelihood.right_sqrt_metric(primals, tangents, **kw),
            self._rkey: self.right_likelihood.right_sqrt_metric(primals, tangents, **kw),
        }
