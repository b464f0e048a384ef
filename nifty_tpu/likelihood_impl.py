"""Concrete likelihood families.

Each class specifies the negative log-likelihood, its Fisher metric, and an
explicit left square root of the metric (so sampling needs no autodiff
round trip where a closed form exists).

Parity: reference ``src/re/likelihood_impl.py`` — ``Gaussian`` ``:89``,
``StudentT`` ``:146``, ``Poissonian`` ``:211``,
``VariableCovarianceGaussian`` ``:261``, ``VariableCovarianceStudentT``
``:326``, ``Categorical`` ``:377``.  Math re-derived from the standard
definitions; energies reduce with highest-precision tree vdots so f32 TPU
runs keep accurate scalars.
"""

from __future__ import annotations

import dataclasses
import operator
from functools import partial
from typing import Any, Callable, Optional

from jax import nn
from jax import numpy as jnp
from jax.tree_util import Partial, tree_map

from .likelihood import Likelihood
from .model import LazyModel
from .tree import ShapeWithDtype, result_type, shape_dtype_like, tsum, vdot


def _studentt_energy(nwr, dof):
    """Negative log-pdf of a standard multivariate Student-t (up to const)."""
    res = (jnp.conj(nwr) * nwr).real if jnp.iscomplexobj(nwr) else nwr * nwr
    res = tree_map(lambda r, d=dof: jnp.log1p(r / d) * (d + 1), res)
    return tsum(res) / 2.0


def _shape_with_dtype(dtype):
    def shp(e):
        return ShapeWithDtype(jnp.shape(e), dtype)

    return shp


@Partial
def _identity(x):
    return x


def _as_diag_ops(cov_inv, std_inv, data):
    """Normalize (cov_inv, std_inv) to callables; infer one from the other
    assuming a diagonal covariance.  Parity: ``src/re/likelihood_impl.py:34``.
    """
    if cov_inv is None and std_inv is None:
        return _identity, _identity

    if cov_inv is not None and not callable(cov_inv):
        cov_inv = Partial(operator.mul, cov_inv)
    if std_inv is not None and not callable(std_inv):
        std_inv = Partial(operator.mul, std_inv)

    ones = tree_map(lambda d: jnp.ones_like(jnp.real(d)), data)
    if cov_inv is None:
        cov_inv = Partial(operator.mul, tree_map(jnp.square, std_inv(ones)))
    elif std_inv is None:
        std_inv = Partial(operator.mul, tree_map(jnp.sqrt, cov_inv(ones)))

    cov_inv = cov_inv if isinstance(cov_inv, (Partial, LazyModel)) else Partial(cov_inv)
    std_inv = std_inv if isinstance(std_inv, (Partial, LazyModel)) else Partial(std_inv)
    return cov_inv, std_inv


class Gaussian(Likelihood):
    """Gaussian likelihood with fixed noise covariance.

    ``energy = 0.5 (d - x)^dagger N^-1 (d - x)``; the metric is ``N^-1``
    and its left square root ``N^-1/2``.
    """

    data: Any = dataclasses.field(metadata=dict(static=False))
    noise_cov_inv: Callable = dataclasses.field(metadata=dict(static=False))
    noise_std_inv: Callable = dataclasses.field(metadata=dict(static=False))

    def __init__(
        self,
        data,
        noise_cov_inv: Optional[Callable] = None,
        noise_std_inv: Optional[Callable] = None,
    ):
        self.data = data
        self.noise_cov_inv, self.noise_std_inv = _as_diag_ops(
            noise_cov_inv, noise_std_inv, data
        )
        shp = shape_dtype_like(data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        res = tree_map(jnp.subtract, self.data, primals)
        return 0.5 * vdot(res, self.noise_cov_inv(res)).real

    def normalized_residual(self, primals):
        return self.noise_std_inv(tree_map(jnp.subtract, self.data, primals))

    def metric(self, primals, tangents):
        return self.noise_cov_inv(tangents)

    def left_sqrt_metric(self, primals, tangents):
        return self.noise_std_inv(tangents)

    def transformation(self, primals):
        return self.noise_std_inv(primals)


class StudentT(Likelihood):
    """Student's t likelihood with fixed scale and dof."""

    data: Any = dataclasses.field(metadata=dict(static=False))
    dof: Any = dataclasses.field(metadata=dict(static=False))
    noise_cov_inv: Callable = dataclasses.field(metadata=dict(static=False))
    noise_std_inv: Callable = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, dof, noise_cov_inv=None, noise_std_inv=None):
        self.data = data
        self.dof = dof
        self.noise_cov_inv, self.noise_std_inv = _as_diag_ops(
            noise_cov_inv, noise_std_inv, data
        )
        shp = shape_dtype_like(data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        res = tree_map(jnp.subtract, self.data, primals)
        return _studentt_energy(self.noise_std_inv(res), self.dof)

    def metric(self, primals, tangents):
        fct = (self.dof + 1) / (self.dof + 3)
        return self.noise_cov_inv(tree_map(lambda t: fct * t, tangents))

    def left_sqrt_metric(self, primals, tangents):
        fct = ((self.dof + 1) / (self.dof + 3)) ** 0.5
        return self.noise_std_inv(tree_map(lambda t: fct * t, tangents))

    def normalized_residual(self, primals):
        return self.left_sqrt_metric(
            None, tree_map(jnp.subtract, self.data, primals)
        )

    def transformation(self, primals):
        fct = ((self.dof + 1) / (self.dof + 3)) ** 0.5
        return self.noise_std_inv(tree_map(lambda p: fct * p, primals))


class Poissonian(Likelihood):
    """Poisson counts likelihood; ``energy = sum(x) - d^T log(x)``.

    The transformation ``2 sqrt(x)`` maps to a unit-metric space
    (Anscombe-like), giving ``lsm(t) = t / sqrt(x)`` and metric ``1/x``.
    """

    data: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, sampling_dtype=float):
        dtp = result_type(data)
        if not jnp.issubdtype(dtp, jnp.integer):
            raise TypeError("Poissonian `data` must have integer dtype")
        self.data = data
        shp = tree_map(_shape_with_dtype(sampling_dtype), data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        return tsum(primals) - vdot(tree_map(jnp.log, primals), self.data)

    def metric(self, primals, tangents):
        return tree_map(jnp.divide, tangents, primals)

    def left_sqrt_metric(self, primals, tangents):
        return tree_map(lambda t, p: t / jnp.sqrt(p), tangents, primals)

    def normalized_residual(self, primals):
        res = tree_map(lambda d, p: d - p, self.data, primals)
        return self.left_sqrt_metric(primals, res)

    def transformation(self, primals):
        return tree_map(lambda p: 2.0 * jnp.sqrt(p), primals)


class VariableCovarianceGaussian(Likelihood):
    """Gaussian likelihood with inferred (diagonal) covariance.

    Acts on a tuple ``(mean, std_inv)``.  The Fisher metric is diagonal in
    these coordinates: ``diag(std_inv^2, 2·ndof / std_inv^2)`` where
    ``ndof`` is the number of real degrees of freedom per data entry
    (1 real, 2 complex).
    """

    data: Any = dataclasses.field(metadata=dict(static=False))
    iscomplex: bool = False

    def __init__(self, data, iscomplex=False):
        self.data = data
        self.iscomplex = iscomplex
        shp = shape_dtype_like((data, jnp.real(data)))
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    @property
    def _ndof(self) -> int:
        """Real degrees of freedom per data entry (2 for complex data) —
        the multiplicity of the log-determinant / scale-curvature terms."""
        return 2 if self.iscomplex else 1

    def energy(self, primals):
        mean, std_inv = primals
        res = (self.data - mean) * std_inv
        return 0.5 * vdot(res, res).real - self._ndof * jnp.sum(
            jnp.log(std_inv)
        )

    def metric(self, primals, tangents):
        prec = primals[1] ** 2  # precision = std_inv^2
        return type(primals)(
            (prec * tangents[0], (2 * self._ndof) * tangents[1] / prec)
        )

    def left_sqrt_metric(self, primals, tangents):
        scale_curv = jnp.sqrt(2.0) ** self._ndof
        return type(primals)(
            (primals[1] * tangents[0], scale_curv * tangents[1] / primals[1])
        )

    def transformation(self, primals):
        # No global Euclidean transformation exists; use the local
        # residual-based approximation (same choice as the reference).
        return type(primals)(
            (
                primals[1] * (primals[0] - self.data),
                self._ndof * jnp.log(primals[1]),
            )
        )

    def normalized_residual(self, primals):
        return (self.data - primals[0]) * primals[1]


class VariableCovarianceStudentT(Likelihood):
    """Student's t likelihood with inferred scale; acts on ``(mean, std)``."""

    data: Any = dataclasses.field(metadata=dict(static=False))
    dof: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, dof):
        self.data = data
        self.dof = dof
        shp = shape_dtype_like((data, data))
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        t = _studentt_energy((self.data - primals[0]) / primals[1], self.dof)
        return t + jnp.sum(jnp.log(primals[1]))

    def metric(self, primals, tangents):
        d = self.dof
        return type(primals)((
            tangents[0] * (d + 1) / (d + 3) / primals[1] ** 2,
            tangents[1] * 2 * d / (d + 3) / primals[1] ** 2,
        ))

    def left_sqrt_metric(self, primals, tangents):
        d = self.dof
        c0 = (d + 1) / (d + 3) / primals[1] ** 2
        c1 = 2 * d / (d + 3) / primals[1] ** 2
        return type(primals)((jnp.sqrt(c0) * tangents[0], jnp.sqrt(c1) * tangents[1]))

    def normalized_residual(self, primals):
        d = self.dof
        return (self.data - primals[0]) / primals[1] * ((d + 1) / (d + 3)) ** 0.5


class Categorical(Likelihood):
    """Categorical (cross-entropy) likelihood over logits."""

    data: Any = dataclasses.field(metadata=dict(static=False))
    axis: int = -1

    def __init__(self, data, axis=-1, sampling_dtype=float):
        self.data = data
        self.axis = axis
        shp = tree_map(_shape_with_dtype(sampling_dtype), data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        def nll(p, d):
            logits = nn.log_softmax(p, axis=self.axis)
            return -jnp.sum(jnp.take_along_axis(logits, d, self.axis))

        return tsum(tree_map(nll, primals, self.data))

    def metric(self, primals, tangents):
        preds = tree_map(partial(nn.softmax, axis=self.axis), primals)
        pt = tree_map(jnp.multiply, preds, tangents)
        norm = tree_map(
            partial(jnp.sum, axis=self.axis, keepdims=True), pt
        )
        return tree_map(lambda p, t, n: p * t - p * n, preds, tangents, norm)

    def left_sqrt_metric(self, primals, tangents):
        sqrtp = tree_map(
            lambda p: jnp.sqrt(nn.softmax(p, axis=self.axis)), primals
        )
        norm = tree_map(
            lambda s, t: jnp.sum(s * t, axis=self.axis, keepdims=True),
            sqrtp, tangents,
        )
        return tree_map(
            lambda s, t, n: s * (t - s * n), sqrtp, tangents, norm
        )


class Bernoulli(Likelihood):
    """Bernoulli event likelihood; ``energy = -d^T log p - (1-d)^T log(1-p)``.

    ``p`` are expected event frequencies in (0, 1); ``data`` holds events
    (1) / non-events (0).  The Fisher metric is ``1/(p(1-p))`` and the
    arcsine transformation ``2 asin(sqrt(p))`` maps to a unit-metric
    space.  Capability parity: classic ``BernoulliEnergy``
    (``src/operators/energy_operators.py:723``; absent from the
    reference's JAX stack).
    """

    data: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, data, sampling_dtype=float):
        dtp = result_type(data)
        if not jnp.issubdtype(dtp, jnp.integer):
            raise TypeError("Bernoulli `data` must have integer dtype")
        self.data = data
        shp = tree_map(_shape_with_dtype(sampling_dtype), data)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        return -vdot(tree_map(jnp.log, primals), self.data) + vdot(
            tree_map(jnp.log1p, tree_map(operator.neg, primals)),
            tree_map(lambda d: d - 1, self.data),
        )

    def metric(self, primals, tangents):
        return tree_map(lambda t, p: t / (p * (1.0 - p)), tangents, primals)

    def left_sqrt_metric(self, primals, tangents):
        return tree_map(
            lambda t, p: t / jnp.sqrt(p * (1.0 - p)), tangents, primals
        )

    def normalized_residual(self, primals):
        res = tree_map(lambda d, p: d - p, self.data, primals)
        return self.left_sqrt_metric(primals, res)

    def transformation(self, primals):
        return tree_map(lambda p: 2.0 * jnp.arcsin(jnp.sqrt(p)), primals)


class InverseGamma(Likelihood):
    """Inverse-gamma likelihood for a variance field ``x``:

        ``energy = sum((alpha+1) log x + beta / x)``

    — the likelihood of the variance ``x = S_k`` given ``beta = 0.5
    |s_k|^2`` for a field ``s`` with covariance ``S_k``.  Transformation
    ``sqrt(alpha+1) * log x`` (metric ``(alpha+1)/x^2``).  Capability
    parity: classic ``InverseGammaEnergy``
    (``src/operators/energy_operators.py:628``).  The normalized residual
    reports ``lsm(2 beta - x)`` (zero-mean under the model) rather than
    the classic constant-residual convention.
    """

    beta: Any = dataclasses.field(metadata=dict(static=False))
    alpha: Any = dataclasses.field(metadata=dict(static=False))

    def __init__(self, beta, alpha=-0.5, sampling_dtype=float):
        self.beta = beta
        self.alpha = tree_map(
            lambda b: jnp.broadcast_to(jnp.asarray(alpha), jnp.shape(b)), beta
        ) if not isinstance(alpha, type(beta)) or jnp.isscalar(alpha) else alpha
        shp = tree_map(_shape_with_dtype(sampling_dtype), beta)
        super().__init__(domain=shp, lsm_tangents_shape=shp)

    def energy(self, primals):
        ap1 = tree_map(lambda a: a + 1.0, self.alpha)
        return vdot(tree_map(jnp.log, primals), ap1) + vdot(
            tree_map(jnp.reciprocal, primals), self.beta
        )

    def metric(self, primals, tangents):
        return tree_map(
            lambda t, p, a: (a + 1.0) * t / (p * p),
            tangents, primals, self.alpha,
        )

    def left_sqrt_metric(self, primals, tangents):
        return tree_map(
            lambda t, p, a: jnp.sqrt(a + 1.0) * t / p,
            tangents, primals, self.alpha,
        )

    def normalized_residual(self, primals):
        res = tree_map(lambda b, p: 2.0 * b - p, self.beta, primals)
        return self.left_sqrt_metric(primals, res)

    def transformation(self, primals):
        return tree_map(
            lambda p, a: jnp.sqrt(a + 1.0) * jnp.log(p), primals, self.alpha
        )
