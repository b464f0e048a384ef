"""Stochastic probing of implicit operators.

- :class:`StatCalculator` — running mean/variance accumulator (parity:
  ``src/probing.py:24``).
- :func:`probe_diagonal` / :func:`probe_trace` — Hutchinson estimators of
  the diagonal/trace of an implicit linear map, vmapped over probes
  (parity: diagonal/trace probing, ``src/probing.py``).
- :func:`approximation2endo` — build a diagonal preconditioner from
  samples (parity: ``src/probing.py:142``); feed the result into the CG
  ``preconditioner`` hook.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax import numpy as jnp
from jax import random
from jax.tree_util import tree_map

from .tree import random_like, shape_dtype_like


class StatCalculator:
    """Welford running mean/variance over pytrees."""

    def __init__(self):
        self._count = 0
        self._mean = None
        self._m2 = None

    def add(self, value):
        self._count += 1
        if self._mean is None:
            self._mean = tree_map(jnp.asarray, value)
            self._m2 = tree_map(jnp.zeros_like, self._mean)
            return
        delta = tree_map(jnp.subtract, value, self._mean)
        self._mean = tree_map(
            lambda m, d: m + d / self._count, self._mean, delta
        )
        delta2 = tree_map(jnp.subtract, value, self._mean)
        self._m2 = tree_map(
            lambda m2, d, d2: m2 + d * d2, self._m2, delta, delta2
        )

    @property
    def mean(self):
        if self._count == 0:
            raise RuntimeError("no values added")
        return self._mean

    @property
    def var(self):
        if self._count < 2:
            raise RuntimeError("need at least 2 values")
        return tree_map(lambda m2: m2 / (self._count - 1), self._m2)


def probe_diagonal(op: Callable, proto, key, n_probes: int = 16):
    """Hutchinson diagonal estimate of an endomorphic map ``op``."""
    keys = random.split(key, n_probes)

    def one(k):
        z = random_like(
            k, shape_dtype_like(proto),
            rng=lambda key, shape, dtype: random.rademacher(
                key, shape, dtype=dtype
            ),
        )
        return tree_map(jnp.multiply, z, op(z))

    probes = jax.vmap(one)(keys)
    return tree_map(lambda p: jnp.mean(p, axis=0), probes)


def probe_trace(op: Callable, proto, key, n_probes: int = 16):
    """Hutchinson trace estimate of an endomorphic map ``op``."""
    from .tree import vdot

    keys = random.split(key, n_probes)

    def one(k):
        z = random_like(
            k, shape_dtype_like(proto),
            rng=lambda key, shape, dtype: random.rademacher(
                key, shape, dtype=dtype
            ),
        )
        return vdot(z, op(z)).real

    return jnp.mean(jax.vmap(one)(keys))


def approximation2endo(samples_of_op, *, eps: float = 1e-12):
    """Diagonal approximation from samples ``y_i = A^{1/2} x_i``: mean of
    ``y^2`` leafwise; use ``lambda r: tree_map(divide, r, diag)`` as a CG
    preconditioner.  Parity: ``src/probing.py:142``."""
    sq = tree_map(lambda s: jnp.mean(s ** 2, axis=0), samples_of_op)
    return tree_map(lambda d: jnp.maximum(d, eps), sq)


def operator_spectrum(op: Callable, proto, k: int = 6, *, which: str = "LM",
                      tol: float = 0.0) -> np.ndarray:
    """Largest-magnitude eigenvalues of a symmetric implicit operator via
    ARPACK on the raveled map (device matvecs, host Arnoldi).

    Parity: ``src/operator_spectrum.py:29,86``.
    """
    import jax.flatten_util
    import scipy.sparse.linalg as ssl

    from .tree import size as tree_size

    x0 = tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shape_dtype_like(proto))
    ravel = lambda x: jax.flatten_util.ravel_pytree(x)[0]
    unravel = jax.flatten_util.ravel_pytree(x0)[1]
    n = tree_size(x0)
    mv = jax.jit(lambda v: ravel(op(unravel(v))))
    lo = ssl.LinearOperator(
        (n, n), matvec=lambda v: np.asarray(mv(jnp.asarray(v)))
    )
    vals = ssl.eigsh(lo, k=k, which=which, tol=tol,
                     return_eigenvectors=False)
    return np.sort(vals)[::-1]
