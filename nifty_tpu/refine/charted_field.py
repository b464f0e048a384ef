"""Iterative charted refinement (ICR) GP fields.

A GP with kernel ``k(r)`` is built level-by-level: the coarsest grid is an
exact draw (dense Cholesky over the small level-0 covariance); each
refinement conditions 2^d fine pixels per coarse site on the 3^d
surrounding coarse values,

    fine = olf · coarse_window + ker_sqrt · ξ ,

with ``olf = k_fc k_cc^{-1}`` (optimal linear filter) and ``ker_sqrt`` the
Cholesky factor of the conditional covariance — the working set stays
O(local window), so memory is O(field) at every resolution (the
reference's "scale the big axis" mechanism, SURVEY §5).

TPU mapping: window extraction is a stack of shifted slices (fused
gathers), the per-site refinement is one einsum over (site, fine, window)
— an MXU batched matmul; on a *regular* chart all interior sites share a
single matrix pair, on a deformed chart matrices are vmapped over sites
(with optional tolerance-deduplication via :func:`nifty_tpu.num.unique`).

Parity: reference ``src/re/refine/charted_field.py:21-148`` (matrices),
``:149,315`` (``RefinementField``/``apply``), compute kernels
``src/re/refine/charted_refine.py:37,223``.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Callable, Optional, Tuple, Union

import jax
import numpy as np
from jax import numpy as jnp

from ..model import Initializer, Model
from ..tree import ShapeWithDtype, random_like
from .chart import CoordinateChart


def _pairwise_dist(a, b):
    """Distances between rows of a (n,d) and b (m,d)."""
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def refinement_matrices(kernel: Callable, coarse_coords, fine_coords,
                        jitter: float = 1e-10):
    """(olf, ker_sqrt) conditioning fine pixels on a coarse window.

    ``coarse_coords`` (nw, d), ``fine_coords`` (nf, d); returns
    ``olf (nf, nw)`` and ``ker_sqrt (nf, nf)``.
    """
    cc = kernel(_pairwise_dist(coarse_coords, coarse_coords))
    fc = kernel(_pairwise_dist(fine_coords, coarse_coords))
    ff = kernel(_pairwise_dist(fine_coords, fine_coords))
    # relative jitter: the conditional covariance of deep levels is many
    # orders of magnitude below the marginal variance
    scale = jnp.max(jnp.abs(jnp.diag(ff)))
    cc = cc + (jitter * scale) * jnp.eye(cc.shape[0], dtype=cc.dtype)
    olf = jax.scipy.linalg.solve(cc, fc.T, assume_a="pos").T
    fine_cov = ff - olf @ fc.T
    fine_cov = fine_cov + (jitter * scale) * jnp.eye(ff.shape[0], dtype=ff.dtype)
    ker_sqrt = jnp.linalg.cholesky(fine_cov)
    return olf, ker_sqrt


def coarse_windows(x, ndim: int):
    """Extract all 3^d windows around interior pixels.

    ``x`` has shape grid ``(n1, ..., nd)``; returns
    ``(n1-2, ..., nd-2, 3^d)`` — a stack of shifted slices (no gather
    tables, fuses into the consuming matmul).
    """
    shifts = list(itertools.product((0, 1, 2), repeat=ndim))
    parts = []
    for s in shifts:
        sl = tuple(
            slice(o, n - 2 + o) for o, n in zip(s, x.shape[:ndim])
        )
        parts.append(x[sl])
    return jnp.stack(parts, axis=-1)


def _interleave_children(y, ndim: int):
    """(..., i1..id, 2^d) block values -> fine grid (2 i1, ..., 2 id)."""
    dims = y.shape[:ndim]
    y = y.reshape(dims + (2,) * ndim)
    # interleave: out[2*i1 + c1, ...] = y[i1, ..., c1, ...]
    perm = []
    for k in range(ndim):
        perm.extend([k, ndim + k])
    y = jnp.transpose(y, perm)
    return y.reshape(tuple(2 * n for n in dims))


class RefinementField(Model):
    """GP field on a (possibly deformed) chart via iterative refinement.

    Parameters
    ----------
    chart : CoordinateChart or tuple/int
        Chart (or ``shape0`` convenience, combined with ``depth``).
    kernel : callable
        Isotropic covariance function ``k(r)``.
    depth, distances0, nonlinear_map :
        Convenience chart construction when ``chart`` is a shape.
    name : str
        Prefix of the excitation keys (``{name}0``, ``{name}1``, ...).
    """

    def __init__(
        self,
        chart,
        kernel: Optional[Callable] = None,
        *,
        depth: Optional[int] = None,
        distances0=None,
        nonlinear_map=None,
        name: str = "xi",
        dtype=None,
    ):
        if not isinstance(chart, CoordinateChart):
            chart = CoordinateChart(
                chart, depth=depth if depth is not None else 3,
                distances0=distances0, nonlinear_map=nonlinear_map,
            )
        self.chart = chart
        self.kernel = kernel
        self.name = name
        ndim = chart.ndim
        n_children = 2 ** ndim

        domain = {f"{name}0": ShapeWithDtype(chart.shape0, dtype)}
        for l in range(chart.depth):
            interior = tuple(n - 2 for n in chart.shapes[l])
            domain[f"{name}{l + 1}"] = ShapeWithDtype(
                interior + (n_children,), dtype
            )
        self._matrices = self._build_matrices()
        init = Initializer(
            {k: partial(random_like, primals=v) for k, v in domain.items()}
        )
        super().__init__(domain=domain, init=init)

    # -- host precompute ---------------------------------------------------
    def _build_matrices(self):
        # Always precompute in f64 (design rule: host precompute is numpy
        # f64): the conditional fine-level covariances span many orders of
        # magnitude and their Cholesky breaks down in f32 beyond ~2 levels.
        with jax.enable_x64():
            return self._build_matrices_x64()

    def _build_matrices_x64(self):
        chart, kernel = self.chart, self.kernel
        ndim = chart.ndim
        cov0_coords = chart.positions(0).reshape(-1, ndim)
        cc0 = kernel(_pairwise_dist(
            jnp.asarray(cov0_coords), jnp.asarray(cov0_coords)
        ))
        cc0 = cc0 + 1e-10 * jnp.eye(cc0.shape[0], dtype=cc0.dtype)
        cov_sqrt0 = np.linalg.cholesky(np.asarray(cc0))

        olfs, kers = [], []
        for l in range(chart.depth):
            coarse_pos = chart.positions(l)
            fine_pos = chart.positions(l + 1)
            interior = tuple(n - 2 for n in chart.shapes[l])
            if chart.is_regular():
                # one shared matrix pair: use the window around the first
                # interior site
                cw = _window_coords(coarse_pos, (0,) * ndim)
                fw = _children_coords(fine_pos, (0,) * ndim, ndim)
                olf, ker = refinement_matrices(
                    kernel, jnp.asarray(cw), jnp.asarray(fw)
                )
                olfs.append(np.asarray(olf))
                kers.append(np.asarray(ker))
            else:
                sites = list(itertools.product(*[range(n) for n in interior]))
                cws = np.stack([_window_coords(coarse_pos, s) for s in sites])
                fws = np.stack(
                    [_children_coords(fine_pos, s, ndim) for s in sites]
                )
                olf, ker = jax.vmap(
                    partial(refinement_matrices, kernel)
                )(jnp.asarray(cws), jnp.asarray(fws))
                olfs.append(np.asarray(olf).reshape(
                    interior + olf.shape[1:]
                ))
                kers.append(np.asarray(ker).reshape(
                    interior + ker.shape[1:]
                ))
        return cov_sqrt0, tuple(olfs), tuple(kers)

    # -- forward -----------------------------------------------------------
    def __call__(self, x):
        chart = self.chart
        ndim = chart.ndim
        cov_sqrt0, olfs, kers = self._matrices
        xi0 = x[f"{self.name}0"]
        field = (jnp.asarray(cov_sqrt0) @ xi0.ravel()).reshape(chart.shape0)
        for l in range(chart.depth):
            xi = x[f"{self.name}{l + 1}"]
            windows = coarse_windows(field, ndim)  # (*interior, 3^d)
            olf, ker = jnp.asarray(olfs[l]), jnp.asarray(kers[l])
            if olf.ndim == 2:  # shared matrices (regular chart)
                mean = jnp.einsum("...w,fw->...f", windows, olf)
                exc = jnp.einsum("...e,fe->...f", xi, ker)
            else:  # per-site matrices (deformed chart)
                mean = jnp.einsum("...w,...fw->...f", windows, olf)
                exc = jnp.einsum("...e,...fe->...f", xi, ker)
            field = _interleave_children(mean + exc, ndim)
        return field


def _window_coords(coarse_pos: np.ndarray, site) -> np.ndarray:
    """3^d window coordinates around interior site (index into interior)."""
    ndim = coarse_pos.shape[-1]
    sl = tuple(slice(s, s + 3) for s in site)
    return coarse_pos[sl].reshape(-1, ndim)


def _children_coords(fine_pos: np.ndarray, site, ndim: int) -> np.ndarray:
    """2^d children coordinates of interior coarse site."""
    sl = tuple(slice(2 * s, 2 * s + 2) for s in site)
    return fine_pos[sl].reshape(-1, ndim)
