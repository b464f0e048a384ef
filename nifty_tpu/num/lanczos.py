"""Lanczos tridiagonalization and stochastic Lanczos quadrature (SLQ).

On-device log-determinant estimates (parametric-VI entropy terms, ELBO
cross-checks).  Capability parity: reference ``src/re/num/lanczos.py`` —
rebuilt here on the tree-vector calculus: the operator may act on *any
pytree* (e.g. a MultiDomain latent tree), Lanczos vectors are stored as a
stacked tree (leading Krylov axis per leaf), probes come from
``tree.random_like`` with Rademacher leaves, and the full
reorthogonalization is one batched contraction against the whole Krylov
block per step (an MXU matmul per leaf, not ``order`` sequential dots).

Implementation notes (why this shape): the Krylov buffer is
zero-initialized and written in place, so projecting ``w`` against the
*entire* buffer every step is both safe (unwritten rows are zero and
contribute nothing) and static-shaped — no triangular masking, no
data-dependent slicing, one ``fori_loop`` with a uniform body.
"""

from __future__ import annotations

from typing import Callable, Optional, TypeVar, Union

import jax
from jax import lax
from jax import numpy as jnp
from jax import random
from jax.tree_util import tree_map

from ..tree import random_like, size as tree_size, vdot

V = TypeVar("V")


def _tree_matvec_stack(stacked, w):
    """Contract a Krylov block against one tree: ``coeff[k] = <V_k, w>``.

    ``stacked`` holds each leaf with a leading ``order`` axis; the result is
    a single ``(order,)`` vector summed across leaves — per-leaf it is a
    matrix·vector product that XLA maps onto the MXU.
    """
    def leaf_contract(vs, x):
        return jnp.tensordot(
            vs.reshape(vs.shape[0], -1).conj(), x.ravel(), axes=1
        )

    leaves = jax.tree_util.tree_leaves(tree_map(leaf_contract, stacked, w))
    out = leaves[0]
    for l in leaves[1:]:
        out = out + l
    return out


def _tree_block_comb(stacked, coeff):
    """Linear combination of the Krylov block: ``sum_k coeff[k] V_k``."""
    return tree_map(
        lambda vs: jnp.tensordot(coeff, vs.reshape(vs.shape[0], -1), axes=1)
        .reshape(vs.shape[1:]),
        stacked,
    )


def _tree_scale(t, a):
    return tree_map(lambda x: a * x, t)


def _tree_norm2(t):
    return jnp.sqrt(vdot(t, t).real)


def lanczos_tridiag(mat: Callable[[V], V], v: V, order: int):
    """Lanczos decomposition ``mat ≈ V^T T V`` with ``T`` tridiagonal.

    ``v`` may be a plain array or any pytree; ``mat`` must be a symmetric
    (self-adjoint) operator on that tree.  Returns ``(tridiag
    (order, order), vecs)`` where ``vecs`` carries a leading Krylov axis on
    every leaf.
    """
    rdt = jnp.result_type(
        *[jnp.real(jnp.zeros((), l.dtype)).dtype
          for l in jax.tree_util.tree_leaves(v)]
    )
    tridiag0 = jnp.zeros((order, order), dtype=rdt)
    vecs0 = tree_map(
        lambda x: jnp.zeros((order,) + x.shape, dtype=x.dtype), v
    )
    v0 = _tree_scale(v, 1.0 / _tree_norm2(v))
    vecs0 = tree_map(lambda vs, x: vs.at[0].set(x), vecs0, v0)

    def step(j, state):
        tridiag, vecs, beta = state
        vj = tree_map(lambda vs: vs[j], vecs)
        v_prev = tree_map(lambda vs: vs[j - 1], vecs)  # j=0: beta==0 kills it
        w = tree_map(lambda a, b: a - beta * b, mat(vj), v_prev)
        alpha = vdot(vj, w).real.astype(rdt)
        tridiag = tridiag.at[j, j].set(alpha)
        w = tree_map(lambda a, b: a - alpha * b, w, vj)
        # Full reorthogonalization against the whole block (zero rows are
        # inert): one batched contraction + one batched combination.
        coeff = _tree_matvec_stack(vecs, w)
        w = tree_map(lambda a, b: a - b, w, _tree_block_comb(vecs, coeff))
        beta = _tree_norm2(w).astype(rdt)
        # Off-diagonals and the next basis vector only exist below the last
        # row; the `where` keeps the final iteration from writing past it.
        last = j == order - 1
        safe = jnp.where(last | (beta == 0.0), 1.0, beta)
        jn = jnp.minimum(j + 1, order - 1)
        tridiag = tridiag.at[j, jn].set(jnp.where(last, tridiag[j, jn], beta))
        tridiag = tridiag.at[jn, j].set(jnp.where(last, tridiag[jn, j], beta))
        vecs = tree_map(
            lambda vs, x: vs.at[jn].set(
                jnp.where(last, vs[jn], x / safe)
            ),
            vecs, w,
        )
        return tridiag, vecs, beta

    beta0 = jnp.zeros((), dtype=rdt)
    tridiag, vecs, _ = lax.fori_loop(0, order, step, (tridiag0, vecs0, beta0))
    return tridiag, vecs


def stochastic_logdet_from_lanczos(
    tridiag_stack: jnp.ndarray, matrix_shape0: int, func: Callable = jnp.log
):
    """SLQ estimate of ``tr func(M)`` from stacked tridiagonal matrices."""
    eig_vals, eig_vecs = jnp.linalg.eigh(tridiag_stack)
    num_probes = tridiag_stack.shape[0]
    first_components = eig_vecs[..., 0, :]
    dots = jnp.sum(first_components**2 * func(eig_vals))
    return matrix_shape0 / num_probes * dots


def stochastic_lq_logdet(
    mat: Union[jnp.ndarray, Callable],
    order: int,
    n_samples: int,
    key,
    *,
    shape0: Optional[int] = None,
    dtype=None,
    probe_like: Optional[V] = None,
    cmap=jax.vmap,
):
    """Stochastic Lanczos quadrature log-determinant of an implicit SPD
    operator (Rademacher probes, ``n_samples × order`` matvecs).

    The operator may act on arrays (give ``shape0``/``dtype``) or on any
    pytree (give ``probe_like``, a tree prototype such as ``model.domain``
    or a position tree — probes are drawn ``random_like`` it).
    """
    if callable(mat):
        mat_fn = mat
    else:
        mat_fn = mat.__matmul__
        shape0 = mat.shape[0] if shape0 is None else shape0
    if probe_like is None:
        if shape0 is None:
            raise ValueError("need `shape0` (array mode) or `probe_like` (tree mode)")
        probe_like = jnp.zeros((shape0,), dtype=dtype or jnp.float_)
    n_dof = tree_size(probe_like)
    if isinstance(key, int):
        key = random.PRNGKey(key)

    def probe(k):
        v = random_like(k, probe_like, rng=random.rademacher)
        tri, _ = lanczos_tridiag(mat_fn, v, order=order)
        return tri

    tridiags = cmap(probe)(random.split(key, n_samples))
    return stochastic_logdet_from_lanczos(tridiags, n_dof)
