"""Iterative refinement GP on the HEALPix sphere.

Level ``l`` is a HEALPix grid at ``nside0 · 2^l`` (nested scheme); each
coarse pixel conditions its four nested children on itself plus its 8
neighbors (window of 9; 7-neighbor corner pixels fall back to an
8-window).  Pixel coordinates are unit vectors from the native HEALPix
core; isotropic kernels act on chordal distance.

TPU mapping: the neighbor window is one gather with a host-precomputed
``(npix, 9)`` index table; the refinement is a per-pixel batched matmul.

Parity: reference ``src/re/refine/healpix_field.py:171`` /
``healpix_refine.py`` (which depend on healpy; here the neighbor tables
come from ``nifty_tpu/native/healpix.cpp``).  Radial×sphere product
charts are not yet implemented (sphere-only).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import numpy as np
from jax import numpy as jnp

from ..model import Initializer, Model
from ..ops import healpix as hpx
from ..tree import ShapeWithDtype, random_like
from .charted_field import _pairwise_dist, refinement_matrices


class HEALPixChart:
    """Refinement chart on the sphere: nside doubles per level."""

    def __init__(self, nside0: int, depth: int):
        self.nside0 = int(nside0)
        self.depth = int(depth)
        self.nsides = tuple(self.nside0 * 2 ** l for l in range(depth + 1))
        self.shapes = tuple((hpx.npix(ns),) for ns in self.nsides)

    def positions(self, level: int) -> np.ndarray:
        ns = self.nsides[level]
        return hpx.pix2vec(ns, np.arange(hpx.npix(ns)), nest=True)

    def neighbor_windows(self, level: int) -> np.ndarray:
        """(npix, 9) nested indices: pixel + 8 neighbors (-1 → self)."""
        ns = self.nsides[level]
        pix = np.arange(hpx.npix(ns))
        nb = hpx.neighbours_nest(ns, pix)
        win = np.concatenate([pix[:, None], nb], axis=1)
        # missing corner neighbors: repeat the center (degenerate column,
        # regularized away by the jitter in the matrix build)
        win = np.where(win < 0, pix[:, None], win)
        return win


class RefinementHPField(Model):
    """GP field on the HEALPix sphere via iterative refinement.

    Parameters
    ----------
    chart : HEALPixChart or int
        Chart (or ``nside0`` convenience combined with ``depth``).
    kernel : callable
        Isotropic covariance as a function of *chordal* distance on the
        unit sphere.
    """

    def __init__(self, chart, kernel: Optional[Callable] = None, *,
                 depth: Optional[int] = None, name: str = "xi", dtype=None):
        if not isinstance(chart, HEALPixChart):
            chart = HEALPixChart(chart, depth if depth is not None else 2)
        self.chart = chart
        self.kernel = kernel
        self.name = name

        domain = {f"{name}0": ShapeWithDtype(chart.shapes[0], dtype)}
        for l in range(chart.depth):
            npix_l = chart.shapes[l][0]
            domain[f"{name}{l + 1}"] = ShapeWithDtype((npix_l, 4), dtype)
        self._matrices = self._build_matrices()
        init = Initializer(
            {k: partial(random_like, primals=v) for k, v in domain.items()}
        )
        super().__init__(domain=domain, init=init)

    def _build_matrices(self):
        chart, kernel = self.chart, self.kernel
        pos0 = jnp.asarray(chart.positions(0))
        cc0 = kernel(_pairwise_dist(pos0, pos0))
        cc0 = cc0 + 1e-10 * jnp.eye(cc0.shape[0], dtype=cc0.dtype)
        cov_sqrt0 = np.linalg.cholesky(np.asarray(cc0))

        olfs, kers, windows = [], [], []
        for l in range(chart.depth):
            coarse_pos = chart.positions(l)
            fine_pos = chart.positions(l + 1)
            win = chart.neighbor_windows(l)
            npix_l = win.shape[0]
            cws = coarse_pos[win]  # (npix, 9, 3)
            children = (
                4 * np.arange(npix_l)[:, None] + np.arange(4)[None, :]
            )
            fws = fine_pos[children]  # (npix, 4, 3)
            olf, ker = jax.vmap(partial(refinement_matrices, kernel))(
                jnp.asarray(cws), jnp.asarray(fws)
            )
            olfs.append(np.asarray(olf))
            kers.append(np.asarray(ker))
            windows.append(win)
        return cov_sqrt0, tuple(olfs), tuple(kers), tuple(windows)

    def __call__(self, x):
        cov_sqrt0, olfs, kers, windows = self._matrices
        field = jnp.asarray(cov_sqrt0) @ x[f"{self.name}0"]
        for l in range(self.chart.depth):
            xi = x[f"{self.name}{l + 1}"]
            w = field[jnp.asarray(windows[l])]  # (npix, 9)
            mean = jnp.einsum("pw,pfw->pf", w, jnp.asarray(olfs[l]))
            exc = jnp.einsum("pe,pfe->pf", xi, jnp.asarray(kers[l]))
            field = (mean + exc).reshape(-1)  # nested children contiguous
        return field
