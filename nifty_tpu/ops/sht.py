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
        # Precomputed tables live in `consts` so they can enter compiled
        # programs as RUNTIME ARGUMENTS (shared device buffers) instead of
        # HLO constants: at lmax≥512 the dense Legendre table is hundreds
        # of MB and constant-baking both bloats every executable and
        # overflows the remote-compile request size (HTTP 413).  Thread
        # them via the ``consts=`` parameter of the transform methods (the
        # `Model.consts` mechanism of the correlated field), or use the
        # ``*_jit`` wrappers which pass them as arguments automatically.
        self.consts = {
            "lam": jnp.asarray(lam, dtype=dtype),  # (mmax+1, nlat, lmax+1)
            "w": jnp.asarray(w, dtype=dtype),
        }
        self._dtype = dtype
        self._jit_cache = {}

    @property
    def _lam(self):
        return self.consts["lam"]

    @property
    def _w(self):
        return self.consts["w"]

    def _jitted(self, name, fn):
        """Jitted functional core: tables enter as call arguments."""
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    @property
    def n_alm(self) -> int:
        return n_alm(self.lmax, self.mmax)

    @property
    def grid_shape(self):
        return (self.nlat, self.nphi)

    def alm2map(self, alm, consts=None):
        """Synthesis: packed complex alm -> real map (nlat, nphi)."""
        c = self.consts if consts is None else consts
        A = _unpack_alm_to_matrix(alm, self.lmax, self.mmax)
        # F[θ, m] = Σ_l Λ[m, θ, l] A[m, l]  (m-batched matvec, MXU)
        F = jnp.einsum(
            "mtl,ml->tm", c["lam"], A,
            precision=jax.lax.Precision.HIGHEST,
        )
        n_half = self.nphi // 2 + 1
        G = jnp.zeros((self.nlat, n_half), dtype=F.dtype)
        G = G.at[:, : self.mmax + 1].set(F)
        return jnp.fft.irfft(self.nphi * G, n=self.nphi, axis=1)

    def map2alm(self, m_arr, consts=None):
        """Analysis (exact on the GL grid): real map -> packed alm."""
        c = self.consts if consts is None else consts
        F = jnp.fft.rfft(m_arr, axis=1)[:, : self.mmax + 1]
        F = F * (2.0 * np.pi / self.nphi)
        Fw = F * c["w"][:, None]
        A = jnp.einsum(
            "mtl,tm->ml", c["lam"], Fw,
            precision=jax.lax.Precision.HIGHEST,
        )
        return _pack_matrix_to_alm(A, self.lmax, self.mmax)

    def alm2map_jit(self, alm):
        """`alm2map` compiled with the tables as runtime arguments."""
        return self._jitted(
            "alm2map", lambda c, a: self.alm2map(a, consts=c)
        )(self.consts, alm)

    def map2alm_jit(self, m_arr):
        return self._jitted(
            "map2alm", lambda c, m: self.map2alm(m, consts=c)
        )(self.consts, m_arr)

    # -- real-coefficient (LMSpace) interface ------------------------------
    def real2alm(self, x):
        """(lmax+1)^2 real coefficients -> packed complex alm."""
        return real2alm(x, self.lmax, self.mmax)

    def alm2real(self, alm):
        return alm2real(alm, self.lmax, self.mmax)

    def synthesize_real(self, x, consts=None):
        """Real LMSpace coefficients -> map (the harmonic transform used by
        spherical correlated fields)."""
        return self.alm2map(self.real2alm(x), consts=consts)

    def synthesize_real_jit(self, x):
        return self._jitted(
            "synthesize_real", lambda c, v: self.synthesize_real(v, consts=c)
        )(self.consts, x)


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


# -- on-the-fly (scan) formulation for large band limits ------------------

def _packed_positions(lmax: int, mmax: int):
    """Host map: (m, l) dense cell -> packed alm position (or -1)."""
    pos = np.full((mmax + 1, lmax + 1), -1, dtype=np.int64)
    ofs = 0
    for m in range(mmax + 1):
        n = lmax + 1 - m
        pos[m, m:] = np.arange(ofs, ofs + n)
        ofs += n
    return pos


class SphericalHarmonicTransformOnTheFly:
    """Exact GL-grid SHT without precomputed Legendre tables.

    For ``lmax ≳ 1000`` the dense table of
    :class:`SphericalHarmonicTransform` — ``(lmax+1)² · nlat`` reals —
    stops fitting in HBM (32 GB at lmax=2000).  This variant generates
    Legendre rows *inside* a ``lax.scan`` over ``l`` (carrying the two
    previous rows of the stable upward three-term recurrence; the
    ``λ_mm`` diagonal is host-precomputed) and contracts them with the
    ``a_lm`` columns on the fly: memory is O((mmax+1)·nlat), compute is
    ~3× the table matmul's FLOPs but on the VPU (libsharp's on-the-fly
    strategy; the reference reaches it through ducc,
    ``src/operators/harmonic_operators.py:265``).

    The analysis direction runs its own forward scan (the exact
    transpose contraction); both directions are registered as a pair of
    mutually-transposed linear primitives so
    ``jit``/``vmap``/``jax.linearize``/``jax.linear_transpose`` all
    compose without materializing per-``l`` residuals.

    Note: float32 underflows ``λ_mm`` near the poles for very high m
    (≳ 2000); use float64 off-TPU if the last digits at the band edge
    matter.
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
        from .. import config

        dtype = dtype if dtype is not None else config.default_float_dtype()
        self._dtype = dtype
        cdtype = jnp.result_type(dtype, jnp.complex64)

        ct, st = np.cos(theta), np.sin(theta)
        # λ_mm diagonal rows for every l (host, f64): (lmax+1, nlat)
        diag = np.empty((self.lmax + 1, self.nlat))
        row = np.full(self.nlat, 1.0 / np.sqrt(4.0 * np.pi))
        diag[0] = row
        for m in range(1, self.lmax + 1):
            row = -np.sqrt(1.0 + 1.0 / (2.0 * m)) * st * row
            diag[m] = row
        ct_j = np.asarray(ct, dtype=dtype)
        diag_j = np.asarray(diag, dtype=dtype)
        m_idx = np.arange(self.mmax + 1, dtype=np.int32)
        ls = np.arange(self.lmax + 1, dtype=np.int32)
        lmax_, mmax_, nlat_ = self.lmax, self.mmax, self.nlat

        def _rec_coeffs(l):
            # factored forms keep f32 exact-ish at large l
            lf = l.astype(ct_j.dtype)
            mf = m_idx.astype(ct_j.dtype)
            active = m_idx < l
            den_a = jnp.where(active, (lf - mf) * (lf + mf), 1.0)
            a = jnp.sqrt((2.0 * lf - 1.0) * (2.0 * lf + 1.0) / den_a)
            num_b = jnp.where(active, (lf - 1.0 - mf) * (lf - 1.0 + mf), 0.0)
            den_b = jnp.where(l >= 2, (2.0 * lf - 3.0) * (2.0 * lf - 1.0), 1.0)
            b = jnp.sqrt(jnp.maximum(num_b / den_b, 0.0))
            return active, a, b

        def _step_rows(carry, l, diag_l):
            prev, prev2 = carry
            active, a, b = _rec_coeffs(l)
            rec = a[:, None] * (ct_j[None, :] * prev - b[:, None] * prev2)
            cur = jnp.where(active[:, None], rec, 0.0)
            cur = jnp.where(
                (m_idx[:, None] == l) & (m_idx[:, None] <= mmax_),
                diag_l[None, :].astype(cur.dtype), cur,
            )
            return (cur, prev), cur

        def synth(A):
            """(mmax+1, lmax+1) complex -> F (nlat, mmax+1) complex."""
            def step(carry, xs):
                (prev, prev2, acc) = carry
                l, diag_l, A_l = xs
                (cur, prv), _ = _step_rows((prev, prev2), l, diag_l)
                acc = acc + A_l[:, None] * cur
                return (cur, prv, acc), None

            z = jnp.zeros((mmax_ + 1, nlat_), dtype=ct_j.dtype)
            acc0 = jnp.zeros((mmax_ + 1, nlat_), dtype=A.dtype)
            (c, p, acc), _ = jax.lax.scan(
                step, (z, z, acc0), (jnp.asarray(ls), jnp.asarray(diag_j), A.T)
            )
            return acc.T

        def synth_T(F):
            """Transpose: (nlat, mmax+1) -> (mmax+1, lmax+1)."""
            Ft = F.T  # (mmax+1, nlat)

            def step(carry, xs):
                l, diag_l = xs
                (cur, prv), _ = _step_rows(carry, l, diag_l)
                y = jnp.sum(cur * Ft, axis=1)
                return (cur, prv), y

            z = jnp.zeros((mmax_ + 1, nlat_), dtype=ct_j.dtype)
            _, ys = jax.lax.scan(
                step, (z, z), (jnp.asarray(ls), jnp.asarray(diag_j))
            )
            return ys.T

        from .linear_prim import make_linear_pair
        import jax.core as _core

        self._synth, self._synth_T = make_linear_pair(
            "sht_legendre", synth, synth_T,
            lambda x: _core.ShapedArray((nlat_, mmax_ + 1), x.dtype),
            lambda y: _core.ShapedArray((mmax_ + 1, lmax_ + 1), y.dtype),
        )
        self._w = jnp.asarray(w, dtype=dtype)
        pos = _packed_positions(self.lmax, self.mmax)
        self._unpack_rows, self._unpack_cols = np.nonzero(pos >= 0)
        self._unpack_src = pos[self._unpack_rows, self._unpack_cols]
        self._cdtype = cdtype

    @property
    def n_alm(self) -> int:
        return n_alm(self.lmax, self.mmax)

    @property
    def grid_shape(self):
        return (self.nlat, self.nphi)

    def _unpack(self, alm):
        A = jnp.zeros((self.mmax + 1, self.lmax + 1), dtype=alm.dtype)
        return A.at[self._unpack_rows, self._unpack_cols].set(
            alm[self._unpack_src]
        )

    def _pack(self, A):
        return A[self._unpack_rows, self._unpack_cols]

    def alm2map(self, alm):
        """Synthesis: packed complex alm -> real map (nlat, nphi)."""
        A = self._unpack(alm.astype(self._cdtype))
        F = self._synth(A)
        n_half = self.nphi // 2 + 1
        G = jnp.zeros((self.nlat, n_half), dtype=F.dtype)
        G = G.at[:, : self.mmax + 1].set(F)
        return jnp.fft.irfft(self.nphi * G, n=self.nphi, axis=1)

    def map2alm(self, m_arr):
        """Analysis (exact on the GL grid): real map -> packed alm."""
        F = jnp.fft.rfft(m_arr, axis=1)[:, : self.mmax + 1]
        F = F * (2.0 * np.pi / self.nphi)
        Fw = F * self._w[:, None]
        return self._pack(self._synth_T(Fw))

    def real2alm(self, x):
        return real2alm(x, self.lmax, self.mmax)

    def alm2real(self, alm):
        return alm2real(alm, self.lmax, self.mmax)

    def synthesize_real(self, x):
        return self.alm2map(self.real2alm(x))
