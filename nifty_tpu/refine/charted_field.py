"""Iterative charted refinement (ICR) GP fields.

A GP with kernel ``k(r)`` is built level-by-level: the coarsest grid is an
exact draw (dense Cholesky over the small level-0 covariance); each
refinement conditions ``fine_size^d`` fine pixels per window on the
``coarse_size^d`` surrounding coarse values,

    fine = olf · coarse_window + ker_sqrt · ξ ,

with ``olf = k_fc k_cc^{-1}`` (optimal linear filter) and ``ker_sqrt`` the
Cholesky factor of the conditional covariance — the working set stays
O(local window), so memory is O(field) at every resolution (the
reference's "scale the big axis" mechanism, SURVEY §5).

TPU mapping: window extraction is a stack of strided slices (fused
gathers) on uniform axes and a precomputed index-table gather on clamped/
periodic axes; the per-site refinement is one einsum over
(site, fine, window) — an MXU batched matmul.  On a regular chart all
sites share a single matrix pair; on a deformed chart matrices vary only
along the chart's irregular axes and are broadcast along regular ones.

Capability parity: reference ``src/re/refine/charted_field.py:21-148``
(matrices), ``:149,315`` (``RefinementField``/``apply``), compute kernels
``src/re/refine/charted_refine.py:37,223`` (``refine_conv_general``
handles the same irregular/clamped geometry via explicit index maps).
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


def _uniform_starts(starts: np.ndarray) -> bool:
    """Whether per-axis window starts form an unclamped uniform stride."""
    if starts.size <= 1:
        return True
    d = np.diff(starts)
    return bool(np.all(d == d[0]))


def coarse_windows(x, ndim: int, *, chart: Optional[CoordinateChart] = None,
                   level: int = 0):
    """Extract all refinement windows around the sites of ``level``.

    ``x`` has shape ``(n1, ..., nd)``; returns ``(ns1, ..., nsd, csz^d)``.
    Without a chart, the classic ``coarse_size=3`` / stride-1 stencil is
    used (back-compatible helper).  Uniform axes use strided slices (which
    fuse into the consuming matmul); clamped or periodic axes gather
    through a host-precomputed index table.
    """
    if chart is None:
        csz, step = 3, 1
        starts = [np.arange(n - 2) for n in x.shape[:ndim]]
        periodic = (False,) * ndim
        shape = x.shape[:ndim]
    else:
        csz, step = chart.coarse_size, chart.window_stride
        starts = chart.window_starts(level)
        periodic = chart.periodic
        shape = chart.shapes[level]

    slice_ok = [
        _uniform_starts(s) and not p for s, p in zip(starts, periodic)
    ]
    if all(slice_ok):
        parts = []
        for offs in itertools.product(range(csz), repeat=ndim):
            sl = tuple(
                slice(o, o + (len(s) - 1) * step + 1, step)
                for o, s in zip(offs, starts)
            )
            parts.append(x[sl])
        return jnp.stack(parts, axis=-1)

    # general path: per-axis index tables, processed from the last axis so
    # freshly inserted window dims never disturb pending axes
    for ax in range(ndim - 1, -1, -1):
        idx = starts[ax][:, None] + np.arange(csz)[None, :]
        idx = idx % shape[ax] if periodic[ax] else idx
        x = jnp.take(x, jnp.asarray(idx), axis=ax)
    # now (ns1, csz, ns2, csz, ...) -> (ns..., csz^d)
    perm = list(range(0, 2 * ndim, 2)) + list(range(1, 2 * ndim, 2))
    x = jnp.transpose(x, perm + list(range(2 * ndim, x.ndim)))
    sites = x.shape[:ndim]
    return x.reshape(sites + (csz ** ndim,))


def _interleave_children(y, ndim: int, fsz: int = 2):
    """(..., i1..id, fsz^d) block values -> fine grid (fsz·i1, ..., fsz·id)."""
    dims = y.shape[:ndim]
    y = y.reshape(dims + (fsz,) * ndim)
    # interleave: out[fsz*i1 + c1, ...] = y[i1, ..., c1, ...]
    perm = []
    for k in range(ndim):
        perm.extend([k, ndim + k])
    y = jnp.transpose(y, perm)
    return y.reshape(tuple(fsz * n for n in dims))


class RefinementField(Model):
    """GP field on a (possibly deformed) chart via iterative refinement.

    Parameters
    ----------
    chart : CoordinateChart or tuple/int
        Chart (or ``shape0`` convenience, combined with the chart kwargs).
    kernel : callable
        Isotropic covariance function ``k(r)``.
    depth, distances0, nonlinear_map, coarse_size, fine_size,
    fine_strategy, periodic :
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
        coarse_size: int = 3,
        fine_size: int = 2,
        fine_strategy: str = "extend",
        periodic=False,
        name: str = "xi",
        dtype=None,
    ):
        if not isinstance(chart, CoordinateChart):
            chart = CoordinateChart(
                chart, depth=depth if depth is not None else 3,
                distances0=distances0, nonlinear_map=nonlinear_map,
                coarse_size=coarse_size, fine_size=fine_size,
                fine_strategy=fine_strategy, periodic=periodic,
            )
        self.chart = chart
        self.kernel = kernel
        self.name = name
        ndim = chart.ndim
        n_children = chart.fine_size ** ndim

        domain = {f"{name}0": ShapeWithDtype(chart.shape0, dtype)}
        for l in range(chart.depth):
            domain[f"{name}{l + 1}"] = ShapeWithDtype(
                chart.site_counts(l) + (n_children,), dtype
            )
        self._matrices = self._build_matrices()
        init = Initializer(
            {k: partial(random_like, primals=v) for k, v in domain.items()}
        )
        super().__init__(domain=domain, init=init)

    # -- host precompute ---------------------------------------------------

    def _varying_axes(self, level: int):
        """Axes along which the refinement matrices differ between sites:
        deformed (irregular) axes, plus axes whose last window was clamped
        to the boundary (non-uniform stride)."""
        chart = self.chart
        starts = chart.window_starts(level)
        out = []
        for a in range(chart.ndim):
            clamped = not _uniform_starts(starts[a])
            if clamped or a in chart.irregular_axes:
                out.append(a)
            if chart.periodic[a] and a in chart.irregular_axes:
                raise ValueError(
                    "periodic axes require a regular (translation-"
                    f"invariant) chart; axis {a} is both periodic and "
                    "irregular"
                )
        return tuple(out)

    def _site_coords(self, level: int, site) -> Tuple[np.ndarray, np.ndarray]:
        """(window, children) Cartesian coordinates of one refinement site.

        Positions of wrapped (periodic) windows use the *unwrapped* index
        continuation so all relative distances stay local.
        """
        chart = self.chart
        ndim = chart.ndim
        csz, fsz = chart.coarse_size, chart.fine_size
        starts = chart.window_starts(level)
        widx = [starts[a][site[a]] + np.arange(csz) for a in range(ndim)]
        fidx = [site[a] * fsz + np.arange(fsz) for a in range(ndim)]
        cw = chart.positions_at(widx, level).reshape(-1, ndim)
        fw = chart.positions_at(fidx, level + 1).reshape(-1, ndim)
        return cw, fw

    def matrices_at(self, level: int, pixel_index, kernel=None):
        """(olf, ker_sqrt) of one refinement site — for tests and
        diagnostics (parity: the reference ``RefinementField.matrices_at``)."""
        kernel = self.kernel if kernel is None else kernel
        with jax.enable_x64():
            cw, fw = self._site_coords(level, tuple(pixel_index))
            return refinement_matrices(
                kernel, jnp.asarray(cw), jnp.asarray(fw)
            )

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
            nsites = chart.site_counts(l)
            varying = self._varying_axes(l)
            if not varying:
                # translation-invariant: one shared matrix pair
                cw, fw = self._site_coords(l, (0,) * ndim)
                olf, ker = refinement_matrices(
                    kernel, jnp.asarray(cw), jnp.asarray(fw)
                )
                olfs.append(np.asarray(olf))
                kers.append(np.asarray(ker))
                continue
            # matrices vary along `varying`; broadcast along the rest
            grid = tuple(
                nsites[a] if a in varying else 1 for a in range(ndim)
            )
            sites = list(itertools.product(*[range(g) for g in grid]))
            cws, fws = zip(*(self._site_coords(l, s) for s in sites))
            olf, ker = jax.vmap(partial(refinement_matrices, kernel))(
                jnp.asarray(np.stack(cws)), jnp.asarray(np.stack(fws))
            )
            olfs.append(np.asarray(olf).reshape(grid + olf.shape[1:]))
            kers.append(np.asarray(ker).reshape(grid + ker.shape[1:]))
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
            windows = coarse_windows(field, ndim, chart=chart, level=l)
            olf, ker = jnp.asarray(olfs[l]), jnp.asarray(kers[l])
            if olf.ndim == 2:  # shared matrices (translation-invariant)
                mean = jnp.einsum("...w,fw->...f", windows, olf)
                exc = jnp.einsum("...e,fe->...f", xi, ker)
            else:  # per-site matrices, broadcast along regular axes
                nsites = windows.shape[:ndim]
                olf = jnp.broadcast_to(olf, nsites + olf.shape[-2:])
                ker = jnp.broadcast_to(ker, nsites + ker.shape[-2:])
                mean = jnp.einsum("...w,...fw->...f", windows, olf)
                exc = jnp.einsum("...e,...fe->...f", xi, ker)
            field = _interleave_children(mean + exc, ndim, chart.fine_size)
        return field
