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
come from ``nifty_tpu/native/healpix.cpp``).  Sphere-only and
sphere × radius product charts are both supported (radial window 3,
radial children 2, combined 27-point window → 8 children).
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
    """Refinement chart on the sphere (optionally × a radial axis).

    Angular resolution doubles per level (nested children); with
    ``radial_chart`` (a 1-D :class:`~nifty_tpu.refine.chart
    .CoordinateChart`) the field lives on sphere × radius and both axes
    refine simultaneously — the reference's HEALPixChart geometry
    (``src/re/refine/chart.py:548``).
    """

    def __init__(self, nside0: int, depth: int, radial_chart=None):
        self.nside0 = int(nside0)
        self.depth = int(depth)
        self.nsides = tuple(self.nside0 * 2 ** l for l in range(depth + 1))
        self.radial_chart = radial_chart
        if radial_chart is None:
            self.shapes = tuple((hpx.npix(ns),) for ns in self.nsides)
        else:
            if radial_chart.ndim != 1 or radial_chart.depth != self.depth:
                raise ValueError(
                    "radial chart must be 1-D with matching depth"
                )
            self.shapes = tuple(
                (hpx.npix(ns), radial_chart.shapes[l][0])
                for l, ns in enumerate(self.nsides)
            )

    def angular_positions(self, level: int) -> np.ndarray:
        ns = self.nsides[level]
        return hpx.pix2vec(ns, np.arange(hpx.npix(ns)), nest=True)

    def positions(self, level: int) -> np.ndarray:
        """Cartesian positions; (npix, 3) or (npix, nr, 3) with radius."""
        vec = self.angular_positions(level)
        if self.radial_chart is None:
            return vec
        r = self.radial_chart.positions(level)[:, 0]  # (nr,)
        return vec[:, None, :] * r[None, :, None]

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
            if chart.radial_chart is None:
                exc_shape = (npix_l, 4)
            else:
                nr_int = chart.shapes[l][1] - 2
                exc_shape = (npix_l, nr_int, 8)
            domain[f"{name}{l + 1}"] = ShapeWithDtype(exc_shape, dtype)
        self._matrices = self._build_matrices()
        init = Initializer(
            {k: partial(random_like, primals=v) for k, v in domain.items()}
        )
        super().__init__(domain=domain, init=init)

    def _build_matrices(self):
        # Host precompute always in f64 (see RefinementField._build_matrices)
        with jax.enable_x64():
            if self.chart.radial_chart is not None:
                return self._build_matrices_radial()
            return self._build_matrices_sphere()

    def _build_matrices_sphere(self):
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

    def _build_matrices_radial(self):
        chart, kernel = self.chart, self.kernel
        pos0 = jnp.asarray(chart.positions(0).reshape(-1, 3))
        cc0 = kernel(_pairwise_dist(pos0, pos0))
        cc0 = cc0 + 1e-10 * jnp.eye(cc0.shape[0], dtype=cc0.dtype)
        cov_sqrt0 = np.linalg.cholesky(np.asarray(cc0))

        olfs, kers, windows = [], [], []
        for l in range(chart.depth):
            coarse_pos = chart.positions(l)      # (npix, nr, 3)
            fine_pos = chart.positions(l + 1)    # (4 npix, 2(nr-2), 3)
            win = chart.neighbor_windows(l)      # (npix, 9)
            npix_l, nr = chart.shapes[l]
            nr_int = nr - 2
            # coarse window coords per (pixel, radial site): 9 x 3 = 27
            ang = coarse_pos[win]                # (npix, 9, nr, 3)
            cws = np.stack(
                [ang[:, :, q:q + 3, :] for q in range(nr_int)], axis=1
            )                                    # (npix, nr_int, 9, 3, 3)
            cws = cws.reshape(npix_l, nr_int, 27, 3)
            # fine children coords: 4 angular x 2 radial = 8
            children_ang = 4 * np.arange(npix_l)[:, None] + np.arange(4)
            fws = fine_pos[children_ang]         # (npix, 4, 2(nr-2), 3)
            fws = np.stack(
                [fws[:, :, 2 * q:2 * q + 2, :] for q in range(nr_int)], axis=1
            )                                    # (npix, nr_int, 4, 2, 3)
            fws = fws.reshape(npix_l, nr_int, 8, 3)
            flat_c = jnp.asarray(cws.reshape(-1, 27, 3))
            flat_f = jnp.asarray(fws.reshape(-1, 8, 3))
            olf, ker = jax.vmap(partial(refinement_matrices, kernel))(
                flat_c, flat_f
            )
            olfs.append(np.asarray(olf).reshape(npix_l, nr_int, 8, 27))
            kers.append(np.asarray(ker).reshape(npix_l, nr_int, 8, 8))
            windows.append(win)
        return cov_sqrt0, tuple(olfs), tuple(kers), tuple(windows)

    def __call__(self, x):
        if self.chart.radial_chart is not None:
            return self._call_radial(x)
        cov_sqrt0, olfs, kers, windows = self._matrices
        field = jnp.asarray(cov_sqrt0) @ x[f"{self.name}0"]
        for l in range(self.chart.depth):
            xi = x[f"{self.name}{l + 1}"]
            w = field[jnp.asarray(windows[l])]  # (npix, 9)
            mean = jnp.einsum("pw,pfw->pf", w, jnp.asarray(olfs[l]))
            exc = jnp.einsum("pe,pfe->pf", xi, jnp.asarray(kers[l]))
            field = (mean + exc).reshape(-1)  # nested children contiguous
        return field

    def _call_radial(self, x):
        cov_sqrt0, olfs, kers, windows = self._matrices
        npix0, nr0 = self.chart.shapes[0]
        field = (jnp.asarray(cov_sqrt0) @ x[f"{self.name}0"].reshape(-1)
                 ).reshape(npix0, nr0)
        for l in range(self.chart.depth):
            xi = x[f"{self.name}{l + 1}"]        # (npix, nr_int, 8)
            npix_l, nr = self.chart.shapes[l]
            nr_int = nr - 2
            w_ang = field[jnp.asarray(windows[l])]  # (npix, 9, nr)
            w = jnp.stack(
                [w_ang[:, :, q:q + 3] for q in range(nr_int)], axis=1
            ).reshape(npix_l, nr_int, 27)
            mean = jnp.einsum("pqw,pqfw->pqf", w, jnp.asarray(olfs[l]))
            exc = jnp.einsum("pqe,pqfe->pqf", xi, jnp.asarray(kers[l]))
            val = (mean + exc).reshape(npix_l, nr_int, 4, 2)
            # children: angular index 4p+ca, radial index 2q+cr
            val = jnp.transpose(val, (0, 2, 1, 3))  # (npix, 4, nr_int, 2)
            field = val.reshape(npix_l * 4, nr_int * 2)
        return field
