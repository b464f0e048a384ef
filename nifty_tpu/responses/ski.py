"""Structured kernel interpolation (KISS-GP style) on TPU.

A GP at arbitrary sampling points is modeled as ``W f`` with ``f`` a field
on a regular inducing grid (with a stationary kernel applied in the
harmonic domain or as a Toeplitz matmul) and ``W`` a multilinear
interpolation operator.  TPU-first design: instead of a generic sparse
matrix (the reference uses scipy-COO → BCOO,
``src/re/structured_kernel_interpolation.py:62-119``), ``W`` is stored as
dense ``(2^ndim, n_points)`` index/weight tables applied with a gather;
its adjoint is an XLA ``segment_sum`` scatter — both native TPU ops.

Parity: ``matmul_toeplitz`` (``:14``), ``interp_mat`` (``:62``),
``HarmonicSKI`` (``:123``), ``ToeplitzSKI`` (``:318``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import numpy as np
from jax import numpy as jnp

from ..model import Model
from ..ops.harmonic import fourier_mode_lengths, hartley
from ..tree import ShapeWithDtype


def matmul_toeplitz(c, x):
    """Multiply the Toeplitz matrix with first column ``c`` (rows =
    conj(c)) onto ``x`` via circulant FFT embedding."""
    c = c.ravel()
    r = c.conjugate()
    n = len(c)
    x_shp = x.shape
    if x.shape[0] != n or x.ndim > 2:
        raise ValueError("invalid matrix product dimensions")
    x2 = x.reshape(n, -1)

    embedded = jnp.concatenate((c, r[-1:0:-1]))
    p = 2 * n - 1
    cmplx = jnp.iscomplexobj(embedded) or jnp.iscomplexobj(x2)
    ft, ift = (jnp.fft.fft, jnp.fft.ifft) if cmplx else (jnp.fft.rfft, jnp.fft.irfft)
    prod = ift(ft(embedded)[:, None] * ft(x2, n=p, axis=0), n=p, axis=0)[:n]
    return prod.reshape(x_shp[0], *x_shp[1:]) if x.ndim > 1 else prod.ravel()


def interpolation_matrix(grid_shape, grid_bounds, sampling_points, *,
                         distances=None):
    """Multilinear interpolation tables: ``(indices, weights)``.

    ``indices``/``weights`` have shape ``(2^ndim, n_points)``; applying is
    ``(w * f.ravel()[idx]).sum(0)`` and the adjoint a segment-sum.
    """
    sampling_points = np.asarray(sampling_points)
    if sampling_points.ndim != 2:
        raise ValueError("sampling_points must have shape (ndim, n_points)")
    ndim, n_points = sampling_points.shape
    if (distances is None) == (grid_bounds is None):
        raise ValueError("exactly one of `distances` or `grid_bounds` expected")
    if grid_bounds is not None:
        grid_bounds = np.asarray(grid_bounds)
        offset = grid_bounds[:, 0]
        distances = (grid_bounds[:, 1] - grid_bounds[:, 0]) / np.asarray(grid_shape)
    else:
        offset = np.zeros(ndim)
        distances = np.broadcast_to(np.asarray(distances), (ndim,))

    corners = np.mgrid[(slice(0, 2),) * ndim].reshape(ndim, -1)  # (ndim, 2^ndim)
    pos = (sampling_points - offset[:, None]) / distances[:, None]
    frac, base = np.modf(pos)
    base = base.astype(np.int64)

    n_corners = 2 ** ndim
    weights = np.zeros((n_corners, n_points))
    indices = np.zeros((n_corners, n_points), dtype=np.int64)
    for i in range(n_corners):
        weights[i] = np.prod(np.abs(1 - corners[:, i][:, None] - frac), axis=0)
        idx_nd = base + corners[:, i][:, None]
        indices[i] = np.ravel_multi_index(idx_nd, grid_shape, mode="clip")
    return jnp.asarray(indices), jnp.asarray(weights)


def apply_interpolation(indices, weights, field_flat):
    """``W f``: gather + weighted sum over the 2^ndim corners."""
    return jnp.sum(weights * field_flat[indices], axis=0)


def adjoint_interpolation(indices, weights, values, grid_size):
    """``W^T v``: scatter-add into the grid (XLA segment-sum)."""
    return jax.ops.segment_sum(
        (weights * values[None, :]).ravel(), indices.ravel(),
        num_segments=grid_size,
    )


class StructuredKernelInterpolation(Model):
    """Harmonic-kernel SKI model: ``x -> W · HT(sqrt(P) · x)``.

    The latent ``x`` is white in the harmonic domain of the (padded)
    inducing grid; ``sqrt(P)`` is the amplitude spectrum of the stationary
    kernel evaluated on the grid's mode lengths; ``W`` interpolates to the
    sampling points.  Covariance of the output ≈ ``W K W^T`` (KISS-GP).
    """

    def __init__(
        self,
        grid_shape: Tuple[int, ...],
        grid_bounds,
        sampling_points,
        amplitude: Callable,
        padding: float = 0.5,
        dtype=None,
    ):
        grid_shape = tuple(int(s) for s in grid_shape)
        grid_bounds = np.asarray(grid_bounds, dtype=float)
        self._indices, self._weights = interpolation_matrix(
            grid_shape, grid_bounds, sampling_points
        )
        # Pad the modeled grid to suppress periodic wrap-around.
        if padding:
            pad = 1.0 + padding
            shape_wpad = tuple(int(np.ceil(s * pad)) for s in grid_shape)
            scl = np.array(shape_wpad) / np.array(grid_shape)
            halfp = (grid_bounds[:, 1] - grid_bounds[:, 0]) * (scl - 1.0) / 2.0
            bounds_wpad = np.stack(
                [grid_bounds[:, 0] - halfp, grid_bounds[:, 1] + halfp], axis=1
            )
        else:
            shape_wpad, bounds_wpad = grid_shape, grid_bounds
        self._grid_shape = grid_shape
        self._padded_shape = shape_wpad
        distances = (bounds_wpad[:, 1] - bounds_wpad[:, 0]) / np.array(shape_wpad)
        self._mode_lengths = jnp.asarray(
            fourier_mode_lengths(shape_wpad, tuple(distances))
        )
        self._amplitude = amplitude
        self._subslice = tuple(slice(0, s) for s in grid_shape)
        super().__init__(
            domain=ShapeWithDtype(shape_wpad, dtype),
            target=ShapeWithDtype((np.asarray(sampling_points).shape[1],), dtype),
        )

    def grid_field(self, x):
        """The correlated field on the (unpadded) inducing grid."""
        amp = self._amplitude(self._mode_lengths)
        f = hartley(amp * x) / np.sqrt(np.prod(self._padded_shape))
        return f[self._subslice]

    def __call__(self, x):
        f = self.grid_field(x)
        return apply_interpolation(self._indices, self._weights, f.ravel())
