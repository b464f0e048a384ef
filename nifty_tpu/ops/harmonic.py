"""Harmonic-space primitives: FFTs and the Hartley transform.

The reference dispatches to the ducc0 C++ FFT (``src/ducc_dispatch.py:66-78``)
— on TPU the XLA FFT is the native path.  The Hartley transform of a real
field is computed from a *real* FFT plus a Hermitian-symmetry unfold, which
halves FLOPs and HBM traffic versus the complex FFT the reference's JAX
stack uses (``src/re/correlated_field.py:21-27``); a c2c fallback is kept
for complex inputs and for verification.

Both conventions of the reference's global ``hartley_convention`` flag are
honored (``src/config.py:14``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax import numpy as jnp

from .. import config


def _axes(x, axes):
    return tuple(range(jnp.ndim(x))) if axes is None else tuple(axes)


def hartley_via_c2c(x, axes: Optional[Tuple[int, ...]] = None):
    """Hartley transform via a complex FFT (works for complex input too)."""
    tmp = jnp.fft.fftn(x, axes=axes)
    if config.get("hartley_convention") == "non_canonical_hartley":
        return tmp.real + tmp.imag
    return tmp.real - tmp.imag


def _unfold_hermitian(half, full_shape, axes):
    """Reconstruct the full-grid spectrum combination from an rfft half.

    For real input, ``F(-k) = conj(F(k))``; the Hartley combination
    ``Re ± Im`` on the missing half equals ``Re ∓ Im`` of the stored half
    with all mapped axes index-reversed (k -> -k mod n).
    """
    ax_last = axes[-1]
    n_last = full_shape[ax_last]
    n_half = half.shape[ax_last]

    sgn = +1.0 if config.get("hartley_convention") == "non_canonical_hartley" else -1.0
    h_stored = half.real + sgn * half.imag

    # Missing tail along the rfft axis: indices n_half..n_last-1 correspond
    # to conj of stored indices n_last-k, with the *other* mapped axes
    # reversed as well.
    def reverse_axis(arr, ax):
        # index map k -> (-k) mod n == roll(flip(arr), 1): lowers to XLA
        # reverse + rotate instead of a (slow on TPU) general gather.
        return jnp.roll(jnp.flip(arr, axis=ax), 1, axis=ax)

    tail_src = jax.lax.slice_in_dim(half, 1, n_last - n_half + 1, axis=ax_last)
    tail = jnp.flip(tail_src, axis=ax_last)
    for ax in axes[:-1]:
        tail = reverse_axis(tail, ax)
    h_tail = tail.real - sgn * tail.imag
    return jnp.concatenate([h_stored, h_tail], axis=ax_last)


def _hartley_impl(x, axes):
    if jnp.iscomplexobj(x):
        return hartley_via_c2c(x, axes=axes)
    full_shape = tuple(x.shape)
    half = jnp.fft.rfftn(x, axes=axes)
    return _unfold_hermitian(half, full_shape, axes)


_SYM_HARTLEY_FNS: dict = {}


def hartley(x, axes: Optional[Tuple[int, ...]] = None):
    """Hartley transform; real-FFT fast path for real inputs.

    Under the global ``deterministic_reductions`` flag, the linear
    transpose is pinned to the *forward implementation itself* (the
    full-grid Hartley matrix is symmetric, ``H^T = H``), making forward
    and adjoint the same program bit-for-bit — a prerequisite for
    mesh-independent inference (the forward is bitwise mesh-independent;
    an autodiff-derived transpose program need not be).
    """
    from functools import partial as _partial

    from .. import config as _cfg
    from .linear_prim import self_adjoint_linear

    axes = _axes(x, axes)
    if not _cfg.get("deterministic_reductions"):
        return _hartley_impl(x, axes)
    # Negative axes keep the map rank-agnostic over leading batch dims
    # (required by the self-adjoint primitive's batching rule).
    neg = tuple(sorted(ax - jnp.ndim(x) for ax in axes))
    fn = _SYM_HARTLEY_FNS.get(neg)
    if fn is None:
        fn = _partial(_hartley_impl, axes=neg)
        _SYM_HARTLEY_FNS[neg] = fn
    return self_adjoint_linear(fn, x)


def fftn(x, axes=None):
    return jnp.fft.fftn(x, axes=axes)


def ifftn(x, axes=None):
    return jnp.fft.ifftn(x, axes=axes)


def fourier_mode_lengths(shape, distances) -> np.ndarray:
    """|k| for every mode of an rfft-ordered full grid (host precompute).

    Parity: mode-length computation in
    ``src/re/correlated_field.py:30-83`` — done in numpy f64 on the host
    since it is static model metadata.
    """
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    distances = np.broadcast_to(np.asarray(distances, dtype=np.float64), (len(shape),))
    mspc_dist = 1.0 / (np.array(shape) * distances)

    m2 = np.zeros(shape, dtype=np.float64)
    for i, (n, d) in enumerate(zip(shape, mspc_dist)):
        k = np.arange(n, dtype=np.float64)
        k = np.minimum(k, n - k) * d
        sl = [None] * len(shape)
        sl[i] = slice(None)
        m2 = m2 + (k ** 2)[tuple(sl)]
    return np.sqrt(m2)


def fourier_mode_index_quarter(shape, distances, unique_lengths) -> np.ndarray:
    """Power-distributor index map on the per-axis *folded* quarter grid.

    ``|k|`` depends on each fft-ordered axis index ``i`` only through
    ``min(i, n - i)``, so the full-grid map factorizes exactly:
    ``idx_full[i0, i1, ...] = idx_q[fold(i0), fold(i1), ...]`` with the
    quarter axis of length ``n//2 + 1``.  On large grids the correlated
    field distributes power on the quarter grid and mirror-expands with
    pure slice/flip/concat (no gather; the transpose is a slice+add fold)
    — 4× (2^d×) less gather/scatter work and a 4× smaller index map than
    the full-grid route.  ``unique_lengths`` must be the (deduplicated)
    table from :func:`fourier_mode_distributor` so indices agree with the
    full map bit-for-bit.
    """
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    distances = np.broadcast_to(
        np.asarray(distances, dtype=np.float64), (len(shape),)
    )
    mspc_dist = 1.0 / (np.array(shape) * distances)
    q_shape = tuple(n // 2 + 1 for n in shape)
    m2 = np.zeros(q_shape, dtype=np.float64)
    for i, (n, d) in enumerate(zip(shape, mspc_dist)):
        k = np.arange(n // 2 + 1, dtype=np.float64) * d
        sl = [None] * len(shape)
        sl[i] = slice(None)
        m2 = m2 + (k ** 2)[tuple(sl)]
    mq = np.sqrt(m2)
    um = np.asarray(unique_lengths)
    binbounds = 0.5 * (um[:-1] + um[1:])
    return np.searchsorted(binbounds, mq).astype(np.int32)


def fourier_mode_distributor(shape, distances):
    """Unique mode lengths, bin index per mode, and bin multiplicity.

    Returns ``(mode_length_idx [int32 ndarray shape], unique_lengths,
    multiplicity)``.  Parity: ``src/re/correlated_field.py:30``.
    """
    m_length = fourier_mode_lengths(shape, distances)
    um = np.unique(m_length)
    tol = 1e-12 * um[-1]
    um = um[np.diff(np.append(um, 2 * um[-1])) > tol]
    binbounds = 0.5 * (um[:-1] + um[1:])
    m_length_idx = np.searchsorted(binbounds, m_length).astype(np.int32)
    m_count = np.bincount(m_length_idx.ravel(), minlength=um.size)
    if np.any(m_count == 0) or um.shape != m_count.shape:
        raise RuntimeError("invalid harmonic mode(s) encountered")
    return m_length_idx, um, m_count
