"""Distributed (pencil-decomposed) FFT / Hartley over a mesh axis.

The reference never shards a single field's transform across processes
(SURVEY §2.8 P7 — the capability this framework *adds*).  Strategy: for a
field sharded along its first axis on mesh axis ``field``,

    1. transform all non-sharded axes locally,
    2. ``all_to_all`` transpose (rows ↔ columns slabs) over ICI,
    3. transform the previously-sharded axis locally,
    4. ``all_to_all`` back to the original sharding.

All compute is local contiguous FFTs (CPU/TPU friendly); the only
communication is tiled all-to-alls, which on TPU ride ICI.  This is the
standard pencil decomposition used by large-scale FFT libraries, expressed
with ``jax.shard_map`` so it composes with jit/vjp/vmap.

No stage ever gathers the full field: a transpose partner axis that is not
divisible by the mesh extent is zero-padded (the pad columns are
transform-independent and sliced away after the return transpose), and the
1-D case uses the four-step FFT (two local FFTs + twiddle factors +
all-to-all transposes) instead of a gather.

The real-input Hartley transform runs at rfft cost: only ``n_last/2 + 1``
of the last axis is transformed and transposed; the redundant half is
reconstructed from Hermitian symmetry, with the mirror along the sharded
axis expressed as a block-reversal ``ppermute`` + one-row edge exchange.

The transforms are linear and self-transposing in the same way as their
dense counterparts, so autodiff through ``shard_map`` yields the correct
(equally distributed) adjoints.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax import lax
from jax import numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import config


def _pad_to_multiple(x, axis: int, p: int):
    """Zero-pad ``axis`` up to the next multiple of ``p``; returns the
    padded array and the original extent."""
    n = x.shape[axis]
    rem = (-n) % p
    if rem == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths), n


def _transpose_fft_axis0(f, axis_name: str, local_fft):
    """Apply ``local_fft`` (an axis-0 1-D transform) to the globally sharded
    axis 0 of ``f`` by transposing against a partner axis.

    Runs inside ``shard_map``.  The partner axis is the innermost local axis
    (contiguous all-to-all messages); it is zero-padded to mesh-extent
    divisibility — pad columns pass through the independent axis-0
    transforms untouched and are sliced away after the return transpose.
    """
    p = lax.axis_size(axis_name)
    t_axis = f.ndim - 1
    f, n_t = _pad_to_multiple(f, t_axis, p)
    # rows -> slabs of the partner axis: local (n0/p, ..., nt) becomes
    # (n0, ..., nt/p); axis 0 is now complete on every device.
    f = lax.all_to_all(f, axis_name, split_axis=t_axis, concat_axis=0,
                       tiled=True)
    f = local_fft(f)
    f = lax.all_to_all(f, axis_name, split_axis=0, concat_axis=t_axis,
                       tiled=True)
    if f.shape[t_axis] != n_t:
        f = lax.slice_in_dim(f, 0, n_t, axis=t_axis)
    return f


def _four_step_fft1d(x, axis_name: str):
    """Distributed 1-D complex FFT of a block-sharded vector (four-step
    algorithm): column FFT across the device axis, twiddle, row FFT, and a
    final interleave→block redistribution — all-to-all only, O(local)
    memory."""
    p = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    m = x.shape[0]  # local block length; global n = p * m
    n = p * m
    if m % p != 0:
        # Four-step needs the local block splittable across devices; pad the
        # *global* problem instead (handled by the caller) — here we only
        # ever see divisible shapes because callers pad, so guard loudly.
        raise ValueError(
            f"distributed 1-D FFT needs local block ({m}) divisible by the "
            f"mesh extent ({p})"
        )
    x = x.astype(jnp.result_type(x.dtype, jnp.complex64))
    # Global view: X[a1, a2], a = a1*m + a2 with a1 = device row.
    # Step 1: length-p DFT over a1 for every column a2.  Bring all rows of
    # an a2-slice onto one device: split a2 into p chunks.
    z = x.reshape(p, m // p)  # (a2 chunk s, t) -> a2 = s*(m//p) + t
    z = lax.all_to_all(z[None], axis_name, split_axis=1, concat_axis=0,
                       tiled=True)[:, 0, :]  # (p=a1, m//p=t) on device s
    z = jnp.fft.fft(z, axis=0)  # over a1 -> b1
    # Step 2: twiddle  e^{-2πi a2 b1 / n}, a2 = s*(m//p)+t locally.
    b1 = jnp.arange(p)[:, None]
    a2 = i * (m // p) + jnp.arange(m // p)[None, :]
    z = z * jnp.exp((-2j * jnp.pi / n) * (b1 * a2)).astype(z.dtype)
    # Step 3: length-m FFT over a2 for every b1.  Device b1 collects its
    # full row: split over b1, concat the a2 chunks.
    z = lax.all_to_all(z, axis_name, split_axis=0, concat_axis=1,
                       tiled=True)[0]  # (m,) = row b1=i, ordered by a2
    z = jnp.fft.fft(z)  # over a2 -> b2; y[b2*p + b1] = z[b2]
    # Step 4: interleaved -> block distribution.  y[b] with b = b2*p + b1;
    # write b2 = c*(m//p) + r, then b = c*m + r*p + b1: chunk c belongs on
    # device c at local offset r*p + b1.
    z = z.reshape(p, 1, m // p)  # (c, -, r)
    z = lax.all_to_all(z, axis_name, split_axis=0, concat_axis=1,
                       tiled=True)[0]  # (p=b1, m//p=r) on device c
    return z.T.reshape(m)  # local l = r*p + b1


def _mirror_axis0(a, axis_name: str):
    """Global index negation ``g -> (-g) mod n`` along the sharded axis 0:
    block-reversal ppermute + local flip + one-row global roll."""
    p = lax.axis_size(axis_name)
    a = lax.ppermute(a, axis_name, [(j, p - 1 - j) for j in range(p)])
    a = jnp.flip(a, axis=0)  # now A1[g] = A[n-1-g]
    # roll by one: A2[g] = A1[g-1] = A[(n-g) mod n]
    edge = lax.ppermute(
        a[-1:], axis_name, [(j, (j + 1) % p) for j in range(p)]
    )
    return jnp.concatenate([edge, a[:-1]], axis=0)


def _mirror_local(a, axis: int):
    """Local index negation along an unsharded axis."""
    return jnp.roll(jnp.flip(a, axis=axis), 1, axis=axis)


def _hartley_combine(re, im):
    if config.get("hartley_convention") == "non_canonical_hartley":
        return re + im
    return re - im


def _local_fftn_sharded0(x, axis_name: str, spatial_ndim: int):
    """Complex n-D FFT of a globally (axis-0)-sharded array; runs inside
    ``shard_map`` on local blocks of shape (n0/p, ...).

    ``spatial_ndim`` is the logical (unbatched) rank: when the enclosing
    computation is vmapped (e.g. over posterior samples), shard_map's
    batching rule hands the body extra *leading* batch axes — those are
    peeled off by self-vmapping so the pencil logic always sees the field
    axes only.
    """
    if x.ndim > spatial_ndim:
        return jax.vmap(
            partial(_local_fftn_sharded0, axis_name=axis_name,
                    spatial_ndim=spatial_ndim)
        )(x)
    if x.ndim == 1:
        return _four_step_fft1d(x, axis_name)
    f = jnp.fft.fftn(x, axes=tuple(range(1, x.ndim)))
    return _transpose_fft_axis0(
        f, axis_name, partial(jnp.fft.fft, axis=0)
    )


def _local_hartley_sharded0(x, axis_name: str, spatial_ndim: int):
    """Real-input Hartley at rfft cost; runs inside ``shard_map``."""
    if x.ndim > spatial_ndim:
        return jax.vmap(
            partial(_local_hartley_sharded0, axis_name=axis_name,
                    spatial_ndim=spatial_ndim)
        )(x)
    x = x.astype(jnp.result_type(x.dtype, jnp.float32))
    nd = x.ndim
    if nd == 1:
        f = _four_step_fft1d(x, axis_name)
        return _hartley_combine(f.real, f.imag)
    n_last = x.shape[-1]
    # rfft over the local axes (real transform on the last axis), then the
    # sharded axis 0 via transpose — on the *halved* spectrum.
    f = jnp.fft.rfftn(x, axes=tuple(range(1, nd)))
    f = _transpose_fft_axis0(f, axis_name, partial(jnp.fft.fft, axis=0))
    h_low = _hartley_combine(f.real, f.imag)
    # Hermitian reconstruction of the redundant half: F[k] = conj(F[m(k)])
    # with m = per-axis index negation — distributed along axis 0, local on
    # the middle axes, and a reversed slice on the halved last axis.
    g = _mirror_axis0(f, axis_name)
    for ax in range(1, nd - 1):
        g = _mirror_local(g, ax)
    lo, hi = 1, n_last - n_last // 2  # mirrored k_last = 1 .. ceil(nl/2)-1
    g = g[..., lo:hi][..., ::-1]
    h_high = _hartley_combine(g.real, -g.imag)
    return jnp.concatenate([h_low, h_high], axis=-1)


def distributed_fftn(x, mesh: Mesh, axis_name: str = "field"):
    """n-D complex FFT of an array sharded along axis 0 of ``axis_name``."""
    spec = P(*([axis_name] + [None] * (x.ndim - 1)))
    fn = shard_map_fn(
        partial(_local_fftn_sharded0, axis_name=axis_name,
                spatial_ndim=x.ndim),
        mesh, spec,
    )
    return fn(x)


_SYM_DIST_HARTLEY_FNS: dict = {}


def distributed_hartley(x, mesh: Mesh, axis_name: str = "field"):
    """Hartley transform of a real array sharded along axis 0, computed at
    rfft cost (only ``n_last/2+1`` spectral columns are transformed and
    communicated).

    Under the global ``deterministic_reductions`` flag, the linear
    transpose is pinned to the forward program (``H^T = H``; see the local
    :func:`nifty_tpu.ops.harmonic.hartley`), so forward and adjoint are
    bitwise identical and mesh-independent.
    """
    from .. import config as _cfg
    from .linear_prim import self_adjoint_linear

    spatial_ndim = x.ndim

    def apply(v):
        # rank-agnostic: extra leading dims are vmap batch dims — the
        # field-sharded axis is always the first *spatial* axis.
        lead = v.ndim - spatial_ndim
        spec = P(*([None] * lead + [axis_name] + [None] * (spatial_ndim - 1)))
        fn = jax.shard_map(
            partial(_local_hartley_sharded0, axis_name=axis_name,
                    spatial_ndim=spatial_ndim),
            mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
        )
        return fn(v)

    if not _cfg.get("deterministic_reductions"):
        spec = P(*([axis_name] + [None] * (x.ndim - 1)))
        fn = shard_map_fn(
            partial(_local_hartley_sharded0, axis_name=axis_name,
                    spatial_ndim=x.ndim),
            mesh, spec,
        )
        return fn(x)

    key = (mesh, axis_name, spatial_ndim)
    cached = _SYM_DIST_HARTLEY_FNS.get(key)
    if cached is None:
        _SYM_DIST_HARTLEY_FNS[key] = cached = apply
    return self_adjoint_linear(cached, x)


def shard_map_fn(fn, mesh: Mesh, spec: P):
    # check_vma=False: the rfft/irfft cotangents inside the vjp are marked
    # varying over the mesh axis by construction; the manual collectives
    # here are the whole point, so the replication checker has nothing to
    # verify.
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
    )
