"""Lanczos tridiagonalization and stochastic Lanczos quadrature (SLQ).

Used for on-device log-determinant estimates (entropy terms of parametric
VI, ELBO cross-checks).  Parity: reference ``src/re/num/lanczos.py:15,95,
115`` — re-designed to operate on arbitrary *pytrees* through the tree
vector calculus instead of flat arrays only, with full reorthogonalization
(a batched matvec against all previous Lanczos vectors — an MXU-friendly
matmul when the tree is a single array).
"""

from __future__ import annotations

from typing import Callable, Optional, TypeVar, Union

import jax
from jax import lax
from jax import numpy as jnp
from jax import random

V = TypeVar("V")


def lanczos_tridiag(mat: Callable, v, order: int):
    """Lanczos decomposition ``mat ≈ V^T T V`` with ``T`` tridiagonal.

    ``v`` may be any array; returns ``(tridiag (order, order), vecs
    (order, *v.shape))``.
    """
    dtype = v.dtype
    shape = v.shape
    tridiag = jnp.zeros((order, order), dtype=dtype)
    vecs = jnp.zeros((order,) + shape, dtype=dtype)

    v = v / jnp.linalg.norm(v)
    vecs = vecs.at[0].set(v)

    w = mat(v)
    alpha = jnp.vdot(w, v)
    tridiag = tridiag.at[0, 0].set(alpha)
    w = w - alpha * v
    beta = jnp.linalg.norm(w)
    tridiag = tridiag.at[0, 1].set(beta).at[1, 0].set(beta)
    vecs = vecs.at[1].set(w / beta)

    def reortho(w, vecs):
        # Single batched projection: w -= V^T (V w); the contraction runs
        # on the MXU instead of `order` sequential dots.
        coeff = jnp.tensordot(
            vecs.reshape(order, -1), w.ravel(), axes=1
        )
        w = w - jnp.tensordot(coeff, vecs.reshape(order, -1), axes=1).reshape(shape)
        return w

    def step(i, state):
        tridiag, vecs, beta = state
        v = vecs[i]
        v_old = vecs[i - 1]
        w = mat(v) - beta * v_old
        alpha = jnp.vdot(w, v)
        tridiag = tridiag.at[i, i].set(alpha)
        w = w - alpha * v
        w = reortho(w, vecs)
        beta = jnp.linalg.norm(w)
        tridiag = tridiag.at[i, i + 1].set(beta).at[i + 1, i].set(beta)
        vecs = vecs.at[i + 1].set(w / beta)
        return tridiag, vecs, beta

    tridiag, vecs, beta = lax.fori_loop(1, order - 1, step, (tridiag, vecs, beta))

    v = vecs[order - 1]
    v_old = vecs[order - 2]
    w = mat(v) - beta * v_old
    alpha = jnp.vdot(w, v)
    tridiag = tridiag.at[order - 1, order - 1].set(alpha)
    return tridiag, vecs


def stochastic_logdet_from_lanczos(
    tridiag_stack: jnp.ndarray, matrix_shape0: int, func: Callable = jnp.log
):
    """SLQ estimate of ``tr func(M)`` from stacked tridiagonal matrices."""
    eig_vals, eig_vecs = jnp.linalg.eigh(tridiag_stack)
    num_probes = tridiag_stack.shape[0]
    first_components = eig_vecs[..., 0, :]
    dots = jnp.sum(first_components ** 2 * func(eig_vals))
    return matrix_shape0 / num_probes * dots


def stochastic_lq_logdet(
    mat: Union[jnp.ndarray, Callable],
    order: int,
    n_samples: int,
    key,
    *,
    shape0: Optional[int] = None,
    dtype=None,
    cmap=jax.vmap,
):
    """Stochastic Lanczos quadrature log-determinant of an implicit SPD
    operator (Rademacher probes, ``n_samples`` × ``order`` matvecs)."""
    shape0 = shape0 if shape0 is not None else mat.shape[0]
    mat_fn = mat if callable(mat) else mat.__matmul__
    if isinstance(key, int):
        key = random.PRNGKey(key)
    keys = random.split(key, n_samples)

    def probe(k):
        v = random.rademacher(k, (shape0,), dtype=dtype or jnp.float_)
        tri, _ = lanczos_tridiag(mat_fn, v, order=order)
        return tri

    tridiags = cmap(probe)(keys)
    return stochastic_logdet_from_lanczos(tridiags, shape0)
