"""Matplotlib multipanel plotting of fields, spectra, and histories.

Parity: reference ``src/plot.py`` (``Plot.add/output`` ``:547-697``,
Mollweide helper ``:46``, energy histories ``:286``) — lean rebuild for
the TPU stack's data types: raw arrays, :class:`~nifty_tpu.field.Field`
over RG/GL/HP/Power domains, and spherical maps.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _mollweide_from_gl(arr2d, nlat, nlon, xsize=512):
    """Rasterize a (nlat, nlon) GL-grid map into a Mollweide image."""
    from .ops.sht import gauss_legendre_quadrature

    theta, _ = gauss_legendre_quadrature(nlat)
    ysize = xsize // 2
    res = np.full((ysize, xsize), np.nan)
    yy, xx = np.mgrid[0:ysize, 0:xsize]
    x = 2 * np.sqrt(2) * (xx + 0.5 - xsize / 2) / (xsize / 2)
    y = np.sqrt(2) * (yy + 0.5 - ysize / 2) / (ysize / 2)
    mask = x ** 2 / 8 + y ** 2 / 2 <= 1
    t = np.arcsin(np.clip(y[mask] / np.sqrt(2), -1, 1))
    lat = np.arcsin(np.clip((2 * t + np.sin(2 * t)) / np.pi, -1, 1))
    lon = np.pi + np.pi * x[mask] / (2 * np.sqrt(2) * np.maximum(np.cos(t), 1e-9))
    th = np.pi / 2 - lat
    it = np.clip(np.searchsorted(theta, th), 0, nlat - 1)
    ip = (lon / (2 * np.pi) * nlon).astype(int) % nlon
    res[mask] = np.asarray(arr2d)[it, ip]
    return res


def _mollweide_from_hp(arr, nside, xsize=512, nest=False):
    from .ops import healpix as hpx

    ysize = xsize // 2
    res = np.full((ysize, xsize), np.nan)
    yy, xx = np.mgrid[0:ysize, 0:xsize]
    x = 2 * np.sqrt(2) * (xx + 0.5 - xsize / 2) / (xsize / 2)
    y = np.sqrt(2) * (yy + 0.5 - ysize / 2) / (ysize / 2)
    mask = x ** 2 / 8 + y ** 2 / 2 <= 1
    t = np.arcsin(np.clip(y[mask] / np.sqrt(2), -1, 1))
    lat = np.arcsin(np.clip((2 * t + np.sin(2 * t)) / np.pi, -1, 1))
    lon = np.pi + np.pi * x[mask] / (2 * np.sqrt(2) * np.maximum(np.cos(t), 1e-9))
    pix = hpx.ang2pix(nside, np.pi / 2 - lat, lon, nest=nest)
    res[mask] = np.asarray(arr)[pix]
    return res


class Plot:
    """Collect panels with :meth:`add`, render with :meth:`output`."""

    def __init__(self):
        self._panels = []

    def add(self, obj, **kwargs):
        self._panels.append((obj, kwargs))

    def _plot_panel(self, ax, obj, kwargs):
        from .domains import GLSpace, HPSpace, PowerSpace, RGSpace
        from .field import Field

        title = kwargs.pop("title", None)
        label = kwargs.pop("label", None)

        if isinstance(obj, Field):
            dom = obj.domain[0] if len(obj.domain) == 1 else None
            arr = np.asarray(obj.val)
            if isinstance(dom, PowerSpace):
                ax.loglog(dom.k_lengths[1:], arr[1:], label=label, **kwargs)
            elif isinstance(dom, GLSpace):
                img = _mollweide_from_gl(
                    arr.reshape(dom.nlat, dom.nlon), dom.nlat, dom.nlon
                )
                ax.imshow(img, origin="lower", **kwargs)
                ax.axis("off")
            elif isinstance(dom, HPSpace):
                img = _mollweide_from_hp(arr, dom.nside)
                ax.imshow(img, origin="lower", **kwargs)
                ax.axis("off")
            elif isinstance(dom, RGSpace) and arr.ndim == 2:
                ax.imshow(arr.T, origin="lower", **kwargs)
            else:
                ax.plot(arr, label=label, **kwargs)
        else:
            arr = np.asarray(obj)
            if arr.ndim == 2:
                ax.imshow(arr.T, origin="lower", **kwargs)
            else:
                ax.plot(arr, label=label, **kwargs)
        if title:
            ax.set_title(title)
        if label:
            ax.legend()

    def output(self, *, name: Optional[str] = None, nx: Optional[int] = None,
               ny: Optional[int] = None, xsize: float = 9, ysize: float = 9,
               dpi: int = 100):
        import matplotlib

        if name is not None:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = len(self._panels)
        if nx is None and ny is None:
            nx = int(np.ceil(np.sqrt(n)))
            ny = int(np.ceil(n / nx))
        elif nx is None:
            nx = int(np.ceil(n / ny))
        elif ny is None:
            ny = int(np.ceil(n / nx))
        fig, axes = plt.subplots(ny, nx, figsize=(xsize, ysize), squeeze=False)
        for i, (obj, kwargs) in enumerate(self._panels):
            self._plot_panel(axes.flat[i], obj, kwargs)
        for j in range(n, nx * ny):
            axes.flat[j].axis("off")
        fig.tight_layout()
        if name is not None:
            fig.savefig(name, dpi=dpi)
            plt.close(fig)
        else:
            plt.show()
        self._panels = []
