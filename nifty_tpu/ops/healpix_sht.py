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


# -- longitude-stage linear primitive pair ---------------------------------
#
# The m-chunked longitude stage runs as a lax.scan (bounding transients
# to (M_CHUNK, npix) per step), but jax.linear_transpose cannot transpose
# a scan whose xs mix linear (F chunks) and integer (slice offsets)
# streams.  Registering the stage and its mathematically-exact adjoint
# as primitives that are each other's transpose sidesteps scan
# transposition entirely — the same rationale as ops/linear_prim, with
# the phase tables as RUNTIME OPERANDS (they are multi-GB Model.consts
# buffers; closure capture would bake them into every executable).

import jax.extend
from jax.interpreters import ad as _ad
from jax.interpreters import batching as _batching
from jax.interpreters import mlir as _mlir

_hp_fwd_p = jax.extend.core.Primitive("hp_longitude_fwd")
_hp_adj_p = jax.extend.core.Primitive("hp_longitude_adj")


def _hp_fwd_impl(F2, cos, sin, rp, *, chunk):
    """(2, padded, nrings) real F chunks -> (npix,) map."""
    padded, nrings = F2.shape[1:]
    n_chunks = padded // chunk
    npix = cos.shape[0]
    Fre = F2[0].reshape(n_chunks, chunk, nrings)
    Fim = F2[1].reshape(n_chunks, chunk, nrings)

    def step(acc, xs):
        fre, fim, m0 = xs
        cchunk = jax.lax.dynamic_slice_in_dim(cos, m0, chunk, axis=1)
        schunk = jax.lax.dynamic_slice_in_dim(sin, m0, chunk, axis=1)
        acc = acc + jnp.einsum(
            "pb,bp->p", cchunk, fre[:, rp],
            precision=jax.lax.Precision.HIGHEST,
        ) - jnp.einsum(
            "pb,bp->p", schunk, fim[:, rp],
            precision=jax.lax.Precision.HIGHEST,
        )
        return acc, None

    m0s = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    acc0 = jnp.zeros((npix,), F2.dtype)
    out, _ = jax.lax.scan(step, acc0, (Fre, Fim, m0s))
    return out


def _hp_adj_impl(ct, cos, sin, rp, *, chunk, nrings):
    """(npix,) cotangent -> (2, padded, nrings) real F chunks."""
    padded = cos.shape[1]
    n_chunks = padded // chunk
    nr = nrings

    def step(_, m0):
        cchunk = jax.lax.dynamic_slice_in_dim(cos, m0, chunk, axis=1)
        schunk = jax.lax.dynamic_slice_in_dim(sin, m0, chunk, axis=1)
        re = jnp.einsum("pb,p->bp", cchunk, ct,
                        precision=jax.lax.Precision.HIGHEST)
        im = -jnp.einsum("pb,p->bp", schunk, ct,
                         precision=jax.lax.Precision.HIGHEST)
        Fre = jax.vmap(lambda row: jax.ops.segment_sum(
            row, rp, num_segments=nr))(re)
        Fim = jax.vmap(lambda row: jax.ops.segment_sum(
            row, rp, num_segments=nr))(im)
        return None, (Fre, Fim)

    m0s = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    _, (Fres, Fims) = jax.lax.scan(step, None, m0s)
    return jnp.stack([
        Fres.reshape(padded, nr), Fims.reshape(padded, nr)
    ])


_hp_fwd_p.def_impl(lambda F2, cos, sin, rp, *, chunk: _hp_fwd_impl(
    F2, cos, sin, rp, chunk=chunk))
_hp_fwd_p.def_abstract_eval(
    lambda F2, cos, sin, rp, *, chunk: jax.core.ShapedArray(
        (cos.shape[0],), F2.dtype
    )
)
_hp_adj_p.def_impl(lambda ct, cos, sin, rp, *, chunk, nrings: _hp_adj_impl(
    ct, cos, sin, rp, chunk=chunk, nrings=nrings))
_hp_adj_p.def_abstract_eval(
    lambda ct, cos, sin, rp, *, chunk, nrings: jax.core.ShapedArray(
        (2, cos.shape[1], nrings), ct.dtype
    )
)


def _hp_fwd_jvp(primals, tangents, *, chunk):
    F2, cos, sin, rp = primals
    t = tangents[0]
    out = _hp_fwd_p.bind(F2, cos, sin, rp, chunk=chunk)
    if isinstance(t, _ad.Zero):
        return out, _ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, _hp_fwd_p.bind(t, cos, sin, rp, chunk=chunk)


def _hp_fwd_transpose(ct, F2, cos, sin, rp, *, chunk):
    assert _ad.is_undefined_primal(F2)
    if isinstance(ct, _ad.Zero):
        return _ad.Zero(F2.aval), None, None, None
    nrings = F2.aval.shape[2]
    out = _hp_adj_p.bind(ct, cos, sin, rp, chunk=chunk, nrings=nrings)
    return out.astype(F2.aval.dtype), None, None, None


def _hp_adj_jvp(primals, tangents, *, chunk, nrings):
    ct, cos, sin, rp = primals
    t = tangents[0]
    out = _hp_adj_p.bind(ct, cos, sin, rp, chunk=chunk, nrings=nrings)
    if isinstance(t, _ad.Zero):
        return out, _ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, _hp_adj_p.bind(t, cos, sin, rp, chunk=chunk, nrings=nrings)


def _hp_adj_transpose(ct, cot, cos, sin, rp, *, chunk, nrings):
    assert _ad.is_undefined_primal(cot)
    if isinstance(ct, _ad.Zero):
        return _ad.Zero(cot.aval), None, None, None
    out = _hp_fwd_p.bind(ct, cos, sin, rp, chunk=chunk)
    return out.astype(cot.aval.dtype), None, None, None


def _hp_fwd_batching(args, dims, *, chunk):
    F2, cos, sin, rp = args
    d0 = dims[0]
    assert all(d is None for d in dims[1:]), "tables are shared"
    F2 = jnp.moveaxis(F2, d0, 0)
    out = jnp.stack([
        _hp_fwd_p.bind(F2[i], cos, sin, rp, chunk=chunk)
        for i in range(F2.shape[0])
    ])
    return out, 0


def _hp_adj_batching(args, dims, *, chunk, nrings):
    ct, cos, sin, rp = args
    d0 = dims[0]
    assert all(d is None for d in dims[1:]), "tables are shared"
    ct = jnp.moveaxis(ct, d0, 0)
    out = jnp.stack([
        _hp_adj_p.bind(ct[i], cos, sin, rp, chunk=chunk, nrings=nrings)
        for i in range(ct.shape[0])
    ])
    return out, 0


_ad.primitive_jvps[_hp_fwd_p] = _hp_fwd_jvp
_ad.primitive_transposes[_hp_fwd_p] = _hp_fwd_transpose
_batching.primitive_batchers[_hp_fwd_p] = _hp_fwd_batching
_mlir.register_lowering(_hp_fwd_p, _mlir.lower_fun(
    lambda F2, cos, sin, rp, *, chunk: _hp_fwd_impl(
        F2, cos, sin, rp, chunk=chunk),
    multiple_results=False))
_ad.primitive_jvps[_hp_adj_p] = _hp_adj_jvp
_ad.primitive_transposes[_hp_adj_p] = _hp_adj_transpose
_batching.primitive_batchers[_hp_adj_p] = _hp_adj_batching
_mlir.register_lowering(_hp_adj_p, _mlir.lower_fun(
    lambda ct, cos, sin, rp, *, chunk, nrings: _hp_adj_impl(
        ct, cos, sin, rp, chunk=chunk, nrings=nrings),
    multiple_results=False))


class HEALPixSHT:
    """Synthesis (and adjoint) between packed alm and a HEALPix map."""

    #: m-block size of the longitude stage's scan.  The unchunked phase
    #: matmul materializes (mmax+1, npix) intermediates — 3.2 GB complex
    #: at nside=256, which multiplied by the VI sample batch OOMed HBM
    #: (74 GB requested at compile).  Chunking over m bounds transients
    #: to (M_CHUNK, npix) per step at identical FLOPs.
    M_CHUNK = 64

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
        # longitude-stage chunk plan (see M_CHUNK): phase tables are
        # padded with zero columns to a whole number of chunks so the
        # scan's dynamic slices never clamp
        nm = self.mmax + 1
        self._chunk = min(self.M_CHUNK, nm)
        self._n_chunks = -(-nm // self._chunk)
        self._m_padded = self._n_chunks * self._chunk
        ms = np.arange(self.mmax + 1)
        # Precomputed tables live in `consts` so they can enter compiled
        # programs as RUNTIME ARGUMENTS rather than HLO constants: at
        # nside=256/lmax=511 the Legendre + phase tables total ~4.3 GB,
        # which constant-baking duplicates per executable and the remote
        # compile service rejects outright (HTTP 413).  Thread via the
        # ``consts=`` method parameter (Model.consts in a correlated
        # field) or the ``*_jit`` wrappers.
        self.consts = {
            "lam": jnp.asarray(lam, dtype=dtype),  # (mmax+1, nrings, lmax+1)
            "ring_of_pix": jnp.asarray(ring_of_pix.astype(np.int32)),
            "cos": jnp.asarray(np.pad(
                np.cos(phi[:, None] * ms[None, :]),
                ((0, 0), (0, self._m_padded - nm))), dtype=dtype),
            "sin": jnp.asarray(np.pad(
                np.sin(phi[:, None] * ms[None, :]),
                ((0, 0), (0, self._m_padded - nm))), dtype=dtype),
        }
        # quadrature weights: equal-area pixels
        self._w = 4.0 * np.pi / self.npix
        self._ring_theta = ring_theta
        self._ring_of_pix_np = ring_of_pix
        self._ring_weights = None  # lazy (host solve)
        self._dtype = dtype
        self._jit_cache = {}

    @property
    def _lam(self):
        return self.consts["lam"]

    @property
    def _ring_of_pix(self):
        return self.consts["ring_of_pix"]

    @property
    def _cos(self):
        return self.consts["cos"]

    @property
    def _sin(self):
        return self.consts["sin"]

    def _jitted(self, name, fn):
        """Jitted functional core: tables enter as call arguments."""
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    @property
    def n_alm(self):
        return n_alm(self.lmax, self.mmax)

    def _chunk_plan(self):
        return self.mmax + 1, self._n_chunks, self._m_padded

    def alm2map(self, alm, consts=None):
        """Synthesis: packed complex alm -> HEALPix map (ring order)."""
        t = self.consts if consts is None else consts
        A = _unpack_alm_to_matrix(alm, self.lmax, self.mmax)
        F = jnp.einsum(
            "mtl,ml->mt", t["lam"], A,
            precision=jax.lax.Precision.HIGHEST,
        )  # (mmax+1, nrings) complex
        c = jnp.concatenate([
            jnp.ones((1,), self._dtype), 2.0 * jnp.ones((self.mmax,), self._dtype)
        ])
        Fc = c[:, None] * F
        nm, n_chunks, padded = self._chunk_plan()
        F2 = jnp.zeros((2, padded, self._nrings), self._dtype)
        F2 = F2.at[0, :nm].set(Fc.real.astype(self._dtype))
        F2 = F2.at[1, :nm].set(Fc.imag.astype(self._dtype))
        return _hp_fwd_p.bind(
            F2, t["cos"], t["sin"], t["ring_of_pix"], chunk=self._chunk
        )

    def alm2map_jit(self, alm):
        return self._jitted(
            "alm2map", lambda t, a: self.alm2map(a, consts=t)
        )(self.consts, alm)

    def _phase_analysis(self, mw, t):
        """Longitude-stage adjoint, m-chunked: weighted map ->
        F (mmax+1, nrings) complex (see M_CHUNK)."""
        nm, n_chunks, padded = self._chunk_plan()
        F2 = _hp_adj_p.bind(
            mw, t["cos"], t["sin"], t["ring_of_pix"],
            chunk=self._chunk, nrings=self._nrings,
        )
        return (F2[0] + 1j * F2[1])[:nm]

    def map2alm_adjoint(self, m_arr, consts=None):
        """Exact adjoint of synthesis, quadrature-weighted: ≈ analysis for
        band-limited maps; feed into CG for iterative exact analysis."""
        t = self.consts if consts is None else consts
        mw = m_arr * self._w
        c = jnp.concatenate([
            jnp.ones((1,), self._dtype), 2.0 * jnp.ones((self.mmax,), self._dtype)
        ])
        F = self._phase_analysis(mw, t)
        A = jnp.einsum("mtl,mt->ml", t["lam"], F * c[:, None],
                       precision=jax.lax.Precision.HIGHEST)
        from .sht import _pack_matrix_to_alm

        return _pack_matrix_to_alm(A, self.lmax, self.mmax)

    def synthesize_real(self, x, consts=None):
        """Real LMSpace coefficients -> HEALPix map (for spherical
        correlated fields on HEALPix grids)."""
        from .sht import real2alm

        return self.alm2map(real2alm(x, self.lmax, self.mmax), consts=consts)

    def synthesize_real_jit(self, x):
        return self._jitted(
            "synthesize_real", lambda t, v: self.synthesize_real(v, consts=t)
        )(self.consts, x)

    def map2alm(self, m_arr, maxiter: int = 20, tol: float = 1e-8,
                consts=None):
        """Iterative analysis: solve ``synth(alm) = map`` in the
        least-squares sense by CG on the normal equations."""
        from ..solvers.cg import _static_cg

        def normal_op(alm):
            return self.map2alm_adjoint(self.alm2map(alm, consts=consts),
                                        consts=consts)

        j = self.map2alm_adjoint(m_arr, consts=consts)
        res = _static_cg(normal_op, j, resnorm=tol, maxiter=maxiter)
        return res.x

    def _get_ring_weights(self):
        if self._ring_weights is None:
            self._ring_weights = healpix_ring_weights(
                self._ring_theta, self._ring_of_pix_np, self.npix,
                2 * self.nside,
            )
        return self._ring_weights

    def map2alm_weighted_jit(self, m_arr):
        self._get_ring_weights()  # host precompute outside the trace
        return self._jitted(
            "map2alm_weighted",
            lambda t, m: self.map2alm_weighted(m, consts=t),
        )(self.consts, m_arr)

    def map2alm_weighted(self, m_arr, consts=None):
        """One-shot analysis with exact-quadrature ring weights.

        Per-ring corrections to the equal-area pixel weight are solved on
        the host so that the HEALPix quadrature integrates all Legendre
        polynomials up to ~2·nside exactly (the scheme ducc ships as
        ``get_ringweights``; the reference consumes it through healpy /
        ducc).  For maps band-limited well below that, this matches the
        CG analysis without any iteration."""
        t = self.consts if consts is None else consts
        rw = jnp.asarray(self._get_ring_weights(), dtype=self._dtype)
        corr = rw[t["ring_of_pix"]]
        mw = m_arr * corr * self._w
        F = self._phase_analysis(mw, t)
        # NOTE: no (1, 2, 2, ...) fold factor here — that belongs to the
        # *synthesis* (folding the ±m pair of a real map); the quadrature
        # analysis integrates e^{-imφ} directly.
        A = jnp.einsum("mtl,mt->ml", t["lam"], F,
                       precision=jax.lax.Precision.HIGHEST)
        from .sht import _pack_matrix_to_alm

        return _pack_matrix_to_alm(A, self.lmax, self.mmax)

def healpix_ring_weights(ring_theta, ring_of_pix, npix, lmax_quad):
    """Per-ring quadrature correction factors (host, float64).

    Find w_r ≥ 0-ish with Σ_p (4π/npix)·w_{r(p)}·P_l(z_p) = 4π·δ_{l0} for
    all l ≤ lmax_quad (odd l vanish by the N–S ring symmetry).  With
    pixels grouped per ring and n_r pixels on ring r this is a small
    dense least-squares problem over the ~4·nside−1 rings, solved once in
    numpy f64.  Equivalent in spirit to ducc's ring-weight computation
    (the reference consumes it via healpy ``map2alm(..., use_weights)``).
    """
    nr = ring_theta.size
    n_per_ring = np.bincount(ring_of_pix, minlength=nr).astype(np.float64)
    z = np.cos(ring_theta)
    # P_l(z_r) for even l up to lmax_quad via the stable recurrence.
    ls = np.arange(0, int(lmax_quad) + 1)
    P = np.zeros((ls.size, nr))
    P[0] = 1.0
    if ls.size > 1:
        P[1] = z
    for l in range(2, ls.size):
        P[l] = ((2 * l - 1) * z * P[l - 1] - (l - 1) * P[l - 2]) / l
    even = ls % 2 == 0
    A = P[even] * n_per_ring[None, :] * (4.0 * np.pi / npix)
    b = np.zeros(even.sum())
    b[0] = 4.0 * np.pi
    # Minimum-norm deviation from unit weights: solve for (w - 1).
    resid = b - A @ np.ones(nr)
    dw, *_ = np.linalg.lstsq(A, resid, rcond=None)
    return 1.0 + dw
