"""Volume-aware fields over :class:`~nifty_tpu.domains.DomainTuple`.

A :class:`Field` is a registered pytree of one jnp array plus static
domain metadata; arithmetic is leafwise, and volume-aware operations
(``weight``, ``vdot``, ``integrate``, per-subdomain reductions) consume
the domains' ``dvol``.  Dict-of-field latent spaces are plain dicts /
:class:`~nifty_tpu.tree.Vector` (the MultiField analog).

Parity: reference ``src/field.py:28,240,296,442,709`` (``Field``,
``weight``, ``vdot``, ``integrate``, pointwise ops) and parts of
``src/sugar.py`` (``makeField``/``full``/``from_random``,
``power_analyze`` ``:109``).
"""

from __future__ import annotations

import operator
import jax
import numpy as np
from jax import numpy as jnp
from jax.tree_util import register_pytree_node_class

from .domains import DOFSpace, DomainTuple, PowerSpace, RGSpace
from .tree import random_like


@register_pytree_node_class
class Field:
    """Immutable array + DomainTuple with volume calculus."""

    def __init__(self, domain, val):
        self._domain = DomainTuple.make(domain)
        self._val = val

    # pytree protocol (domain is static metadata)
    def tree_flatten(self):
        return ((self._val,), self._domain)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, children[0])

    @property
    def domain(self):
        return self._domain

    @property
    def val(self):
        return self._val

    @property
    def shape(self):
        return self._domain.shape

    @property
    def size(self):
        return self._domain.size

    @property
    def dtype(self):
        return self._val.dtype

    # -- constructors -----------------------------------------------------
    @classmethod
    def full(cls, domain, value):
        domain = DomainTuple.make(domain)
        return cls(domain, jnp.full(domain.shape, value))

    @classmethod
    def from_random(cls, domain, key, dtype=None):
        from .tree import ShapeWithDtype

        domain = DomainTuple.make(domain)
        return cls(domain, random_like(key, ShapeWithDtype(domain.shape, dtype)))

    # -- volume calculus --------------------------------------------------
    def _dvol_factor(self, power=1):
        fct = 1.0
        arrays = []
        for i, d in enumerate(self._domain):
            sd = d.scalar_dvol
            if sd is not None:
                fct *= sd ** power
            else:
                dv = np.asarray(d.dvol) ** power
                ax = self._domain.axes[i]
                arr = dv.reshape(
                    [self.shape[a] if a in ax else 1 for a in range(len(self.shape))]
                )
                arrays.append(arr)
        return fct, arrays

    def weight(self, power=1):
        """Multiply by the pixel volume to the given power."""
        fct, arrays = self._dvol_factor(power)
        val = self._val * fct
        for a in arrays:
            val = val * jnp.asarray(a)
        return Field(self._domain, val)

    def vdot(self, other: "Field"):
        if self._domain != other._domain:
            raise ValueError("domain mismatch")
        return jnp.vdot(self.weight(1)._val, other._val,
                        precision=jax.lax.Precision.HIGHEST)

    def integrate(self):
        return jnp.sum(self.weight(1)._val)

    def s_sum(self):
        return jnp.sum(self._val)

    def s_mean(self):
        return jnp.mean(self._val)

    def s_var(self):
        return jnp.var(self._val)

    def s_std(self):
        return jnp.std(self._val)

    def norm(self, ord=2):
        return jnp.linalg.norm(self._val.ravel(), ord=ord)

    # -- arithmetic -------------------------------------------------------
    def _binary(self, other, op):
        if isinstance(other, Field):
            if self._domain != other._domain:
                raise ValueError("domain mismatch")
            return Field(self._domain, op(self._val, other._val))
        return Field(self._domain, op(self._val, other))

    def __add__(self, o):
        return self._binary(o, operator.add)

    def __radd__(self, o):
        return self._binary(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._binary(o, operator.sub)

    def __rsub__(self, o):
        return self._binary(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._binary(o, operator.mul)

    def __rmul__(self, o):
        return self._binary(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._binary(o, operator.truediv)

    def __rtruediv__(self, o):
        return self._binary(o, lambda a, b: b / a)

    def __pow__(self, o):
        return self._binary(o, operator.pow)

    def __neg__(self):
        return Field(self._domain, -self._val)

    def __abs__(self):
        return Field(self._domain, jnp.abs(self._val))

    def ptw(self, name, *args, **kwargs):
        """Pointwise function application by name (exp/log/sqrt/...)."""
        fn = getattr(jnp, name)
        return Field(self._domain, fn(self._val, *args, **kwargs))

    def exp(self):
        return self.ptw("exp")

    def log(self):
        return self.ptw("log")

    def sqrt(self):
        return self.ptw("sqrt")

    def __repr__(self):
        return f"Field(domain={self._domain}, shape={self.shape}, dtype={self.dtype})"


def makeField(domain, arr) -> Field:
    return Field(DomainTuple.make(domain), jnp.asarray(arr))


def full(domain, value) -> Field:
    return Field.full(domain, value)


def from_random(domain, key, dtype=None) -> Field:
    return Field.from_random(domain, key, dtype)


def power_analyze(field: Field, binbounds=None) -> Field:
    """Measure the power spectrum of a field on a harmonic RGSpace.

    Parity: ``src/sugar.py:109``.
    """
    if len(field.domain) != 1 or not isinstance(field.domain[0], RGSpace) \
            or not field.domain[0].harmonic:
        raise ValueError("power_analyze requires a single harmonic RGSpace")
    pspace = PowerSpace(field.domain[0], binbounds=binbounds)
    idx = jnp.asarray(pspace.pindex)
    power = jax.ops.segment_sum(
        jnp.abs(field.val.ravel()) ** 2,
        idx.ravel(),
        num_segments=pspace.shape[0],
    )
    counts = jnp.asarray(pspace.dvol)
    return Field(DomainTuple.make(pspace), power / counts)


def dof_distributor(dofdex, partner=None):
    """Linear map distributing degrees of freedom onto a target grid.

    ``dofdex`` is a static integer array associating every pixel of the
    target with one underlying DOF (bins must be contiguous from 0 with no
    empty bins).  Returns ``(times, dof_space)``: ``times`` maps a 1-D DOF
    vector to the target grid via the framework's bin-gather primitive, so
    its transpose under ``jax.linear_transpose`` is the exact per-DOF
    segment sum (the reference's ``adjoint_times``) and both directions run
    the Pallas TPU kernels for small tables.

    Parity: ``src/operators/distributors.py:28`` (``DOFDistributor``) +
    ``src/domains/dof_space.py:23``; the distribution scheme is identical,
    but where the reference builds an operator object pair this is a plain
    linear closure whose adjoint is derived by the AD system.
    """
    from .ops.pallas_gather import distribute_power

    idx = np.asarray(dofdex)
    if not np.issubdtype(idx.dtype, np.integer):
        raise TypeError("dofdex must contain integer numbers")
    nbin = int(idx.max()) + 1 if idx.size else 0
    if partner is not None and partner.scalar_dvol is None:
        wgt = np.bincount(
            idx.ravel(), minlength=nbin,
            weights=np.asarray(partner.dvol).ravel(),
        )
    else:
        wgt = np.bincount(idx.ravel(), minlength=nbin).astype(np.float64)
        if partner is not None:
            wgt = wgt * partner.scalar_dvol
    if (wgt == 0).any():
        raise ValueError("empty bins detected")
    dof_space = DOFSpace(wgt)

    def times(x):
        return distribute_power(x, idx)

    return times, dof_space


def create_power_operator(harmonic_domain: RGSpace, power_spectrum):
    """Diagonal covariance-from-spectrum applier on a harmonic grid.

    Parity: ``src/sugar.py:196``; returns a callable (the TPU stack has no
    operator objects — diagonal operators are closures).
    """
    k = harmonic_domain.get_k_length_array()
    diag = power_spectrum(k) if callable(power_spectrum) else jnp.asarray(power_spectrum)

    def apply(x):
        return diag * x

    return apply
