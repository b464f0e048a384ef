"""Line-of-sight (tomography) response.

Each ray is integrated by sampling the field at ``n_sampling_points``
equidistant points via multilinear interpolation (``map_coordinates``) and
summing — on TPU this is a batched gather + reduction, vmapped over rays;
the adjoint (needed for metric CG) is the corresponding scatter-add,
generated automatically by vjp.

Parity: reference ``src/re/extra/sampling_los.py:15-120``
(``SamplingCartesianGridLOS``); the classic stack's sparse-matrix
``LOSResponse`` (``src/library/los_response.py``) is subsumed by this
device-native sampling formulation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
from jax import numpy as jnp
from jax.scipy.ndimage import map_coordinates

from ..model import Model
from ..tree import ShapeWithDtype


def _ray_integral(field, start, end, *, distances, shape, n_sampling_points,
                  order):
    """Integrate one ray from ``start`` to ``end`` (world coordinates)."""
    shape_arr = jnp.asarray(shape, dtype=field.dtype)
    loc_per_world = ((shape_arr - 1) / shape_arr) / distances
    s = start * loc_per_world
    e = end * loc_per_world
    step = (e - s) / n_sampling_points
    t = jnp.arange(n_sampling_points, dtype=field.dtype) + 0.5
    # (ndim, n_sampling_points) index coordinates along the ray
    coords = s[:, None] + step[:, None] * t[None, :]
    values = map_coordinates(field, list(coords), order=order, cval=jnp.nan)
    length = jnp.linalg.norm(end - start)
    return values.sum() * (length / n_sampling_points)


class SamplingCartesianGridLOS(Model):
    """Line-of-sight integrals over a regular Cartesian grid.

    Parameters
    ----------
    start, end : array (n_rays, ndim) or (ndim,)
        Ray endpoints in world coordinates.
    shape : tuple
        Grid shape of the input field.
    distances : tuple of float
        Pixel sizes per axis.
    n_sampling_points : int
        Samples per ray.
    interpolation_order : int
        0 (nearest) or 1 (multilinear).
    """

    start: jax.Array = dataclasses.field(metadata=dict(static=False))
    end: jax.Array = dataclasses.field(metadata=dict(static=False))
    distances: jax.Array = dataclasses.field(metadata=dict(static=False))

    def __init__(
        self,
        start,
        end,
        *,
        shape,
        distances,
        n_sampling_points: int = 500,
        interpolation_order: int = 1,
        dtype=None,
    ):
        self.start = jnp.atleast_2d(jnp.asarray(start))
        self.end = jnp.atleast_2d(jnp.asarray(end))
        self.distances = jnp.asarray(distances)
        self._shape = tuple(shape)
        self._n_sampling_points = int(n_sampling_points)
        self._order = int(interpolation_order)
        n_rays = max(self.start.shape[0], self.end.shape[0])
        super().__init__(
            domain=ShapeWithDtype(self._shape, dtype),
            target=ShapeWithDtype((n_rays,), dtype),
        )

    def __call__(self, x):
        integ = partial(
            _ray_integral,
            x,
            distances=self.distances,
            shape=self._shape,
            n_sampling_points=self._n_sampling_points,
            order=self._order,
        )
        start = jnp.broadcast_to(
            self.start, (max(self.start.shape[0], self.end.shape[0]),
                         self.start.shape[1])
        )
        end = jnp.broadcast_to(
            self.end, (max(self.start.shape[0], self.end.shape[0]),
                       self.end.shape[1])
        )
        return jax.vmap(integ)(start, end)
