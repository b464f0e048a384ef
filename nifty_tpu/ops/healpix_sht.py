"""Spherical harmonic synthesis on HEALPix grids.

Two-stage TPU formulation: (1) the Legendre stage evaluates
``F[m, ring] = Σ_l λ_lm(θ_ring) a_lm`` as an m-batched matmul over the
4·nside−1 iso-latitude rings; (2) the longitude stage evaluates
``map[p] = Re Σ_m c_m F[m, ring(p)] e^{i m φ_p}`` with host-precomputed
per-pixel cos/sin phase tables — a dense (npix × mmax+1) matmul pair that
rides the MXU.  Cost O(nrings·lmax² + npix·lmax), memory O(npix·lmax).

``map2alm_adjoint`` is the exact adjoint (quadrature-weighted transpose),
so an (approximately unbiased) analysis is available via CG on
``synth∘adjoint`` — the same strategy healpy's iterative ``map2alm``
uses; on HEALPix no exact quadrature exists.

Replaces the ducc ``sharpjob_d`` HEALPix path of the reference
(``src/operators/harmonic_operators.py:279-320``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax import numpy as jnp

from . import healpix as hpx
from .sht import _unpack_alm_to_matrix, n_alm, normalized_legendre_table


class HEALPixSHT:
    """Synthesis (and adjoint) between packed alm and a HEALPix map."""

    def __init__(self, lmax: int, nside: int, mmax: Optional[int] = None,
                 dtype=None):
        from .. import config

        self.lmax = int(lmax)
        self.mmax = int(mmax) if mmax is not None else self.lmax
        self.nside = int(nside)
        self.npix = hpx.npix(nside)
        dtype = dtype if dtype is not None else config.default_float_dtype()

        theta, phi = hpx.pix2ang(nside, np.arange(self.npix))
        # ring id per pixel via unique colatitudes
        ring_theta, ring_of_pix = np.unique(np.round(theta, 14),
                                            return_inverse=True)
        self._nrings = ring_theta.size
        lam = normalized_legendre_table(self.lmax, ring_theta, self.mmax)
        self._lam = jnp.asarray(lam, dtype=dtype)  # (mmax+1, nrings, lmax+1)
        self._ring_of_pix = jnp.asarray(ring_of_pix.astype(np.int32))
        ms = np.arange(self.mmax + 1)
        self._cos = jnp.asarray(np.cos(phi[:, None] * ms[None, :]), dtype=dtype)
        self._sin = jnp.asarray(np.sin(phi[:, None] * ms[None, :]), dtype=dtype)
        # quadrature weights: equal-area pixels
        self._w = 4.0 * np.pi / self.npix
        self._dtype = dtype

    @property
    def n_alm(self):
        return n_alm(self.lmax, self.mmax)

    def alm2map(self, alm):
        """Synthesis: packed complex alm -> HEALPix map (ring order)."""
        A = _unpack_alm_to_matrix(alm, self.lmax, self.mmax)
        F = jnp.einsum(
            "mtl,ml->mt", self._lam, A,
            precision=jax.lax.Precision.HIGHEST,
        )  # (mmax+1, nrings) complex
        c = jnp.concatenate([
            jnp.ones((1,), self._dtype), 2.0 * jnp.ones((self.mmax,), self._dtype)
        ])
        Fp = (c[:, None] * F)[:, self._ring_of_pix]  # (mmax+1, npix)
        return jnp.einsum(
            "pm,mp->p", self._cos, Fp.real,
            precision=jax.lax.Precision.HIGHEST,
        ) - jnp.einsum(
            "pm,mp->p", self._sin, Fp.imag,
            precision=jax.lax.Precision.HIGHEST,
        )

    def map2alm_adjoint(self, m_arr):
        """Exact adjoint of synthesis, quadrature-weighted: ≈ analysis for
        band-limited maps; feed into CG for iterative exact analysis."""
        mw = m_arr * self._w
        c = jnp.concatenate([
            jnp.ones((1,), self._dtype), 2.0 * jnp.ones((self.mmax,), self._dtype)
        ])
        re = jnp.einsum("pm,p->mp", self._cos, mw,
                        precision=jax.lax.Precision.HIGHEST)
        im = -jnp.einsum("pm,p->mp", self._sin, mw,
                         precision=jax.lax.Precision.HIGHEST)
        Fp = re + 1j * im  # (mmax+1, npix)
        # sum over pixels per ring (transpose of the ring gather)
        F = jax.vmap(
            lambda row: jax.ops.segment_sum(
                row, self._ring_of_pix, num_segments=self._nrings
            )
        )(Fp)
        A = jnp.einsum("mtl,mt->ml", self._lam, F * c[:, None],
                       precision=jax.lax.Precision.HIGHEST)
        from .sht import _pack_matrix_to_alm

        return _pack_matrix_to_alm(A, self.lmax, self.mmax)

    def synthesize_real(self, x):
        """Real LMSpace coefficients -> HEALPix map (for spherical
        correlated fields on HEALPix grids)."""
        from .sht import real2alm

        return self.alm2map(real2alm(x, self.lmax, self.mmax))

    def map2alm(self, m_arr, maxiter: int = 20, tol: float = 1e-8):
        """Iterative analysis: solve ``synth(alm) = map`` in the
        least-squares sense by CG on the normal equations."""
        from ..solvers.cg import _static_cg

        def normal_op(alm):
            return self.map2alm_adjoint(self.alm2map(alm))

        j = self.map2alm_adjoint(m_arr)
        res = _static_cg(normal_op, j, resnorm=tol, maxiter=maxiter)
        return res.x
