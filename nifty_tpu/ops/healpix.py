"""HEALPix pixelization (ring + nested), backed by the native C++ core.

Replaces the reference's external healpy dependency
(``src/re/refine/healpix_refine.py:18``,
``src/re/refine/chart.py:573`` use ``healpy.pixelfunc``): pixel↔angle
maps, scheme conversions, pixel center vectors, and 8-neighbor tables —
all host-side precompute consumed as device arrays.

Backend: ``nifty_tpu/native/healpix.cpp`` (self-implemented from the
HEALPix geometry; compiled on demand, called through ctypes).
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import get_lib


def _lib():
    lib = get_lib("healpix")
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_dp = ctypes.POINTER(ctypes.c_double)
    if not getattr(lib, "_sig_done", False):
        lib.hpx_pix2ang_ring.argtypes = [ctypes.c_int64, c_i64p, ctypes.c_int64, c_dp, c_dp]
        lib.hpx_ang2pix_ring.argtypes = [ctypes.c_int64, c_dp, c_dp, ctypes.c_int64, c_i64p]
        lib.hpx_pix2ang_nest.argtypes = [ctypes.c_int64, c_i64p, ctypes.c_int64, c_dp, c_dp]
        lib.hpx_ang2pix_nest.argtypes = [ctypes.c_int64, c_dp, c_dp, ctypes.c_int64, c_i64p]
        lib.hpx_nest2ring.argtypes = [ctypes.c_int64, c_i64p, ctypes.c_int64, c_i64p]
        lib.hpx_ring2nest.argtypes = [ctypes.c_int64, c_i64p, ctypes.c_int64, c_i64p]
        lib.hpx_neighbors_nest.argtypes = [ctypes.c_int64, c_i64p, ctypes.c_int64, c_i64p]
        lib.hpx_pix2vec_ring.argtypes = [ctypes.c_int64, c_i64p, ctypes.c_int64, c_dp]
        lib._sig_done = True
    return lib


def _as_i64(x):
    return np.ascontiguousarray(np.atleast_1d(x), dtype=np.int64)


def _as_f64(x):
    return np.ascontiguousarray(np.atleast_1d(x), dtype=np.float64)


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def npix(nside: int) -> int:
    return 12 * int(nside) ** 2


def pix2ang(nside: int, pix, nest: bool = False):
    pix = _as_i64(pix)
    theta = np.empty(pix.size)
    phi = np.empty(pix.size)
    fn = _lib().hpx_pix2ang_nest if nest else _lib().hpx_pix2ang_ring
    fn(nside, _i64p(pix), pix.size, _f64p(theta), _f64p(phi))
    return theta, phi


def ang2pix(nside: int, theta, phi, nest: bool = False):
    theta, phi = _as_f64(theta), _as_f64(phi)
    out = np.empty(theta.size, dtype=np.int64)
    fn = _lib().hpx_ang2pix_nest if nest else _lib().hpx_ang2pix_ring
    fn(nside, _f64p(theta), _f64p(phi), theta.size, _i64p(out))
    return out


def nest2ring(nside: int, pix):
    pix = _as_i64(pix)
    out = np.empty(pix.size, dtype=np.int64)
    _lib().hpx_nest2ring(nside, _i64p(pix), pix.size, _i64p(out))
    return out


def ring2nest(nside: int, pix):
    pix = _as_i64(pix)
    out = np.empty(pix.size, dtype=np.int64)
    _lib().hpx_ring2nest(nside, _i64p(pix), pix.size, _i64p(out))
    return out


def neighbours_nest(nside: int, pix):
    """8 neighbors per pixel (SW, W, NW, N, NE, E, SE, S); -1 = missing."""
    pix = _as_i64(pix)
    out = np.empty(8 * pix.size, dtype=np.int64)
    _lib().hpx_neighbors_nest(nside, _i64p(pix), pix.size, _i64p(out))
    return out.reshape(pix.size, 8)


def pix2vec(nside: int, pix, nest: bool = False):
    pix = _as_i64(pix)
    if nest:
        pix = nest2ring(nside, pix)
    out = np.empty(3 * pix.size)
    _lib().hpx_pix2vec_ring(nside, _i64p(pix), pix.size, _f64p(out))
    return out.reshape(pix.size, 3)
