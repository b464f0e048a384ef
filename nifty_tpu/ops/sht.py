"""Spherical harmonic transforms, TPU-native (batched-matmul formulation).

The reference delegates SHTs to the ducc0 C++ library
(``src/operators/harmonic_operators.py:265`` ``sharpjob_d``).  On TPU the
right formulation is dense linear algebra: the Legendre stage is an
``m``-batched matrix product between precomputed associated-Legendre
tables ``Λ[m, θ, l]`` and the ``a_lm`` columns — exactly the shape the MXU
wants — and the longitude stage is an rFFT over φ.

- Synthesis (alm2map): ``F[θ, m] = Σ_l Λ[m, θ, l] a_lm``; ``map =
  irfft(nphi · F)``.
- Analysis (map2alm) on a Gauss-Legendre grid is *exact* for band-limited
  maps: ``a_lm = Σ_θ (2π/nphi) w_θ Λ[m, θ, l] rfft(map)[θ, m]``.

Legendre tables are precomputed on the host in float64 with the stable
diagonal + three-term upward recurrences (libsharp-style, Condon-Shortley
phase included) and cast to the compute dtype once.  Memory is
``(lmax+1)² · nlat`` reals — fine for lmax ≲ 1000; an on-the-fly
scan-formulated variant is the planned extension for larger bands.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax import numpy as jnp


def gauss_legendre_quadrature(nlat: int) -> Tuple[np.ndarray, np.ndarray]:
    """Colatitudes (ascending) and quadrature weights for ∫ dcosθ."""
    x, w = np.polynomial.legendre.leggauss(nlat)
    return np.arccos(x[::-1]), w[::-1]


def n_alm(lmax: int, mmax: Optional[int] = None) -> int:
    mmax = lmax if mmax is None else mmax
    return (mmax + 1) * (lmax + 1) - (mmax * (mmax + 1)) // 2


def alm_index(l, m, lmax: int):
    """healpy-compatible index of (l, m) in the packed alm array."""
    return (m * (2 * lmax + 1 - m)) // 2 + l


def normalized_legendre_table(lmax: int, theta: np.ndarray,
                              mmax: Optional[int] = None) -> np.ndarray:
    """λ_lm(θ) with Y_lm = λ_lm e^{imφ}; shape (mmax+1, nlat, lmax+1).

    Stable recurrences in float64:
      λ_00 = 1/sqrt(4π)
      λ_mm = -sqrt(1 + 1/(2m)) sinθ λ_{m-1,m-1}            (diagonal, CS phase)
      λ_lm = a_l [cosθ λ_{l-1,m} - b_l λ_{l-2,m}],
      a_l = sqrt((4l²-1)/(l²-m²)), b_l = sqrt(((l-1)²-m²)/(4(l-1)²-1)).
    """
    mmax = lmax if mmax is None else mmax
    theta = np.asarray(theta, dtype=np.float64)
    nlat = theta.size
    ct, st = np.cos(theta), np.sin(theta)
    lam = np.zeros((mmax + 1, nlat, lmax + 1))

    diag = np.full(nlat, 1.0 / np.sqrt(4.0 * np.pi))
    for m in range(mmax + 1):
        if m > 0:
            diag = -np.sqrt(1.0 + 1.0 / (2.0 * m)) * st * diag
        lam[m, :, m] = diag
        prev, prev2 = diag, np.zeros(nlat)
        for l in range(m + 1, lmax + 1):
            a = np.sqrt((4.0 * l * l - 1.0) / (l * l - m * m))
            b = np.sqrt(((l - 1.0) ** 2 - m * m) / (4.0 * (l - 1.0) ** 2 - 1.0))
            cur = a * (ct * prev - b * prev2)
            lam[m, :, l] = cur
            prev2, prev = prev, cur
    return lam


def _pack_matrix_to_alm(A, lmax, mmax):
    """(mmax+1, lmax+1) dense (zero for l<m) -> packed 1-D alm."""
    parts = [A[m, m:] for m in range(mmax + 1)]
    return jnp.concatenate(parts)


def _unpack_alm_to_matrix(alm, lmax, mmax):
    rows = []
    ofs = 0
    for m in range(mmax + 1):
        n = lmax + 1 - m
        row = jnp.concatenate(
            [jnp.zeros((m,), dtype=alm.dtype), alm[ofs:ofs + n]]
        )
        rows.append(row)
        ofs += n
    return jnp.stack(rows)


class SphericalHarmonicTransform:
    """Exact SHT between packed complex alm and a Gauss-Legendre grid.

    Parameters
    ----------
    lmax : int
        Band limit.
    nlat, nphi : int, optional
        Grid resolution; defaults (exactness): ``nlat = lmax + 1``,
        ``nphi = 2 lmax + 2``.
    dtype : dtype, optional
        Compute dtype of the Legendre tables (f64 tables are always used
        for precompute; cast once).
    """

    def __init__(self, lmax: int, nlat: Optional[int] = None,
                 nphi: Optional[int] = None, mmax: Optional[int] = None,
                 dtype=None):
        self.lmax = int(lmax)
        self.mmax = int(mmax) if mmax is not None else self.lmax
        self.nlat = int(nlat) if nlat is not None else self.lmax + 1
        self.nphi = int(nphi) if nphi is not None else 2 * self.lmax + 2
        if self.nphi < 2 * self.mmax + 1:
            raise ValueError("nphi must be at least 2*mmax+1")
        theta, w = gauss_legendre_quadrature(self.nlat)
        self.theta, self.quad_weights = theta, w
        lam = normalized_legendre_table(self.lmax, theta, self.mmax)
        from .. import config

        dtype = dtype if dtype is not None else config.default_float_dtype()
        self._lam = jnp.asarray(lam, dtype=dtype)  # (mmax+1, nlat, lmax+1)
        self._w = jnp.asarray(w, dtype=dtype)
        self._dtype = dtype

    @property
    def n_alm(self) -> int:
        return n_alm(self.lmax, self.mmax)

    @property
    def grid_shape(self):
        return (self.nlat, self.nphi)

    def alm2map(self, alm):
        """Synthesis: packed complex alm -> real map (nlat, nphi)."""
        A = _unpack_alm_to_matrix(alm, self.lmax, self.mmax)
        # F[θ, m] = Σ_l Λ[m, θ, l] A[m, l]  (m-batched matvec, MXU)
        F = jnp.einsum(
            "mtl,ml->tm", self._lam, A,
            precision=jax.lax.Precision.HIGHEST,
        )
        n_half = self.nphi // 2 + 1
        G = jnp.zeros((self.nlat, n_half), dtype=F.dtype)
        G = G.at[:, : self.mmax + 1].set(F)
        return jnp.fft.irfft(self.nphi * G, n=self.nphi, axis=1)

    def map2alm(self, m_arr):
        """Analysis (exact on the GL grid): real map -> packed alm."""
        F = jnp.fft.rfft(m_arr, axis=1)[:, : self.mmax + 1]
        F = F * (2.0 * np.pi / self.nphi)
        Fw = F * self._w[:, None]
        A = jnp.einsum(
            "mtl,tm->ml", self._lam, Fw,
            precision=jax.lax.Precision.HIGHEST,
        )
        return _pack_matrix_to_alm(A, self.lmax, self.mmax)

    # -- real-coefficient (LMSpace) interface ------------------------------
    def real2alm(self, x):
        """(lmax+1)^2 real coefficients -> packed complex alm."""
        return real2alm(x, self.lmax, self.mmax)

    def alm2real(self, alm):
        return alm2real(alm, self.lmax, self.mmax)

    def synthesize_real(self, x):
        """Real LMSpace coefficients -> map (the harmonic transform used by
        spherical correlated fields)."""
        return self.alm2map(self.real2alm(x))


def real2alm(x, lmax: int, mmax: Optional[int] = None):
    """(lmax+1)^2 real coefficients -> packed complex alm.

    Layout: m=0 column (lmax+1 reals), then per m>0 interleaved (Re, Im)
    pairs scaled by 1/sqrt(2) so a band-limited map built from white real
    coefficients has unit covariance per coefficient.
    """
    mmax = lmax if mmax is None else mmax
    out = [x[: lmax + 1] + 0j]
    ofs = lmax + 1
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for m in range(1, mmax + 1):
        n = lmax + 1 - m
        re = x[ofs:ofs + 2 * n:2]
        im = x[ofs + 1:ofs + 2 * n:2]
        out.append((re + 1j * im) * inv_sqrt2)
        ofs += 2 * n
    return jnp.concatenate(out)


def alm2real(alm, lmax: int, mmax: Optional[int] = None):
    mmax = lmax if mmax is None else mmax
    parts = [alm[: lmax + 1].real]
    ofs = lmax + 1
    sqrt2 = np.sqrt(2.0)
    for m in range(1, mmax + 1):
        n = lmax + 1 - m
        block = alm[ofs:ofs + n] * sqrt2
        inter = jnp.stack([block.real, block.imag], axis=-1).reshape(-1)
        parts.append(inter)
        ofs += n
    return jnp.concatenate(parts)
