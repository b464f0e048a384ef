"""Coordinate charts for iterative refinement.

A chart maps refinement-level grid indices to Cartesian (modeling)
coordinates; refinement matrices are then built from the *true* distances
between charted points, so arbitrarily deformed/curved grids get a
correctly adapted GP prior.

Parity: reference ``src/re/refine/chart.py:25`` (``CoordinateChart``) and
``:548`` (``HEALPixChart``) — re-designed: levels are derived from a
``shape0``+``depth`` pair with the fixed refinement geometry
"3-window → 2 children per axis", and the chart callable maps continuous
level-0 fractional indices to Cartesian coordinates.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple, Union

import numpy as np


def _coordinate_grids(shape, level: int):
    """Fractional level-0 index coordinates of every pixel at ``level``.

    Level 0 pixels sit at integer indices; each refinement halves the
    spacing: children of pixel j sit at j ± 4^-1 · 2^{-(level-1)}.
    """
    idx = [np.arange(n, dtype=np.float64) for n in shape]
    return idx


class CoordinateChart:
    """Regular-to-Cartesian chart with optional nonlinear deformation.

    Parameters
    ----------
    shape0 : tuple of int
        Shape of the coarsest grid.
    depth : int
        Number of refinement levels.
    distances0 : tuple of float
        Level-0 pixel spacings (in chart input units).
    nonlinear_map : callable, optional
        Map from regular coordinates (index * distances0) to Cartesian
        modeling coordinates; identity when None.  Its input/output are
        arrays of shape (*grid_shape, ndim).
    """

    def __init__(
        self,
        shape0: Union[int, Sequence[int]],
        depth: int,
        distances0: Union[float, Sequence[float], None] = None,
        nonlinear_map: Optional[Callable] = None,
    ):
        self.shape0 = (
            (int(shape0),) if np.isscalar(shape0) else tuple(int(s) for s in shape0)
        )
        self.ndim = len(self.shape0)
        self.depth = int(depth)
        if distances0 is None:
            distances0 = (1.0,) * self.ndim
        elif np.isscalar(distances0):
            distances0 = (float(distances0),) * self.ndim
        self.distances0 = tuple(float(d) for d in distances0)
        self.nonlinear_map = nonlinear_map

        # Grid shapes per level: each refinement keeps the interior
        # (n-2 coarse pixels) and splits it in two per axis.
        shapes = [self.shape0]
        for _ in range(self.depth):
            shapes.append(tuple(2 * (n - 2) for n in shapes[-1]))
            if any(n <= 0 for n in shapes[-1]):
                raise ValueError("shape0 too small for the requested depth")
        self.shapes = tuple(shapes)

    def level_indices(self, level: int):
        """Fractional level-0 indices of all pixels at ``level`` (per
        axis)."""
        idx = [np.arange(n, dtype=np.float64) for n in self.shape0]
        for l in range(level):
            step = 0.5 ** (l + 1)
            idx = [
                np.repeat(a[1:-1], 2) + np.tile([-step / 2, step / 2], a.size - 2)
                for a in idx
            ]
        return idx

    def positions(self, level: int) -> np.ndarray:
        """Cartesian coordinates of all pixels at ``level``;
        shape (*shapes[level], ndim)."""
        idx = self.level_indices(level)
        mesh = np.meshgrid(*idx, indexing="ij")
        reg = np.stack(
            [m * d for m, d in zip(mesh, self.distances0)], axis=-1
        )
        if self.nonlinear_map is not None:
            return np.asarray(self.nonlinear_map(reg))
        return reg

    def is_regular(self) -> bool:
        return self.nonlinear_map is None
