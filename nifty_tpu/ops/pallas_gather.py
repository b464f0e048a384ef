"""Small-table gather as a first-class JAX primitive with a Pallas TPU path.

The correlated field distributes a small amplitude spectrum onto every
harmonic mode: ``amp_full = amp[dist]`` with a *static* index map.  XLA
lowers this to a slow general gather on TPU (measured ~7 ms for a 1024²
grid vs ~0.02 ms for the FFT it feeds — the dominant cost of the CF
forward pass; reference equivalent: the ``PowerDistributor`` matrix-free
operator, ``src/operators/distributors.py:31``).  The Pallas kernel
computes the same gather as a blocked compare-and-select reduction
entirely in VMEM — O(span) VPU ops per element but no HBM-indirect
addressing — with the current batch row's table streamed through SMEM
for scalar broadcast loads.

``bin_gather`` is registered as a custom primitive so every transform the
framework relies on composes:

- **JVP** (``jax.linearize`` in the Newton-CG hessian-vector product and
  the likelihood metric): the op is linear in ``table`` — the tangent is
  the same gather of the tangent table.
- **Transpose** (``jax.linear_transpose`` in the metric, VJPs): the exact
  per-bin segment sum, implemented by a Pallas scatter-accumulate kernel.
- **Batching** (``vmap`` over posterior samples): leading batch axes of
  ``table`` collapse onto the kernel's batch grid dimension.  When
  ``jax.linearize`` residualizes the (shared) index map per sample, the
  *both-batched* case runs natively: ``batched_idx=True`` pairs
  ``idx``'s leading axis with the table batch, with per-batch block
  ranges — per-element cost stays O(span), not O(B·span), and the bin
  axis is never widened.

The select loop costs O(block span) per element, so the kernel is gated
on :data:`SMALL_TABLE_MAX_BINS`; above it (e.g. the 83k unique modes of
a 1024² grid) XLA's gather wins and is used instead.  Off-TPU the
primitive lowers to the plain XLA gather/segment-sum.
"""

from __future__ import annotations

import hashlib
import os
from collections import OrderedDict

import jax
import jax.extend
import numpy as np
from jax import numpy as jnp
from jax.interpreters import ad, batching, mlir

_BLOCK_ROWS = 32  # block = (_BLOCK_ROWS, 128) indices per grid step; larger
# blocks amortize the per-bin scalar-load/loop overhead over more vregs.
# NOTE: Mosaic's fori_loop only supports unroll=1 or full unroll.

#: Run the Pallas kernels in interpret mode (CPU) — enables exercising the
#: exact kernel code paths in the test suite without TPU hardware.
_INTERPRET = os.environ.get("NIFTY_TPU_PALLAS_INTERPRET", "0") == "1"

#: Largest table for which the select-loop kernel beats XLA's gather.
#: Measured on TPU (see docs/design.md): gather wins 4-21x up to ~1k bins
#: (1024^2/200 bins: 1.1 ms vs 9.2 ms; 4096^2/212: 6.5 ms vs 138.5 ms).
#: Both kernels loop only over each block's *static* [min, max] bin range
#: (for log-binned power spectra most blocks span a handful of bins), so
#: per-element cost is O(bins-present-in-block), not O(nbins).
#:
#: Mid-size tables (1024 < nb <= 4096) take the kernel path only when the
#: batch is a single row: the unbinned 128^2 CF's 3238-mode table measured
#: 1.65x faster through the kernels unbatched (value_and_grad 0.278 ms ->
#: 0.154 ms, `docs/perf_probe9.json`), but the select loop pays
#: O(batch * span) under vmap where XLA's batched gather wins (the full
#: fused 128^2 update regressed 53 -> 36 samples/s with the wide path
#: enabled for batches).  Wide-span tables above ~4k modes (256^2
#: unbinned and up) always lower to XLA.
SMALL_TABLE_MAX_BINS = 1024
SCATTER_MAX_BINS = 1024
WIDE_TABLE_MAX_BINS = 4096


def _pad_to(x, mult, axis=0, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# -- kernels -------------------------------------------------------------
#
# Grid is (B, I): batch rows outer, index blocks inner.  The table block
# streams ONE batch row (1, npad) through SMEM per grid step, so SMEM use
# is independent of the batch count; with ``shared=False`` the index map
# (and its static block ranges) carries its own leading batch axis.


def _make_gather_kernel(shared: bool, tb_rows: int):
    from jax import lax
    from jax.experimental import pallas as pl

    def kernel(lo_ref, hi_ref, idx_ref, table_ref, out_ref):
        i = pl.program_id(1)
        bsel = 0 if shared else pl.program_id(0)
        # the table streams through SMEM in tiles of ``tb_rows`` batch
        # rows (Mosaic's sublane granularity); select this step's row
        row = (
            lax.rem(pl.program_id(0), jnp.int32(tb_rows))
            if tb_rows > 1 else 0
        )
        ids = idx_ref[0]  # (BR, 128) int32

        def body(b, acc):
            val = table_ref[row, b]
            return acc + jnp.where(ids == b, val, 0.0)

        out_ref[0] = lax.fori_loop(
            lo_ref[bsel, i], hi_ref[bsel, i] + 1, body,
            jnp.zeros(ids.shape, dtype=out_ref.dtype),
        )

    return kernel


def _make_scatter_kernel(shared: bool):
    """Per-bin segment sums with deferred cross-lane reduction.

    Per block and bin only a sublane partial-sum lands in a VMEM
    accumulator row (``acc[b, lane] += Σ_sublanes``); the expensive
    cross-lane reduction happens ONCE per batch row at the final grid
    step.  Like the gather, the bin loop covers only the block's static
    [min, max] index range.
    """
    from jax import lax
    from jax.experimental import pallas as pl

    def kernel(lo_ref, hi_ref, idx_ref, cot_ref, out_ref, acc_ref):
        i = pl.program_id(1)
        n_i = pl.num_programs(1)
        bsel = 0 if shared else pl.program_id(0)
        ids = idx_ref[0]  # (BR, 128)
        cot = cot_ref[0]  # (BR, 128)

        @pl.when(i == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(b, _):
            part = jnp.sum(
                jnp.where(ids == b, cot, 0.0), axis=0, keepdims=True
            )  # (1, 128) lane partials
            acc_ref[pl.dslice(b, 1), :] = acc_ref[pl.dslice(b, 1), :] + part
            return 0

        lax.fori_loop(lo_ref[bsel, i], hi_ref[bsel, i] + 1, body, 0)

        @pl.when(i == n_i - 1)
        def _finalize():
            out_ref[0] = jnp.sum(acc_ref[...], axis=1, keepdims=True)

    return kernel


def _block_ranges(idx3):
    """Per-(BR,128)-block [min, max] of the (B_i, rows, 128) index map.

    The index map is a static model constant, so XLA folds these
    reductions at compile time — the kernel's bin loops become
    effectively-static narrow ranges at zero runtime cost.
    """
    b_i = idx3.shape[0]
    blocks = idx3.reshape(b_i, -1, _BLOCK_ROWS * 128)
    lo = jnp.min(blocks, axis=2).astype(jnp.int32)
    hi = jnp.max(blocks, axis=2).astype(jnp.int32)
    return lo, hi  # (B_i, I)


def _norm_idx(idx, batched_idx, block):
    """Flatten/pad idx to (B_i, rows, 128) with B_i = 1 (shared) or B."""
    b_i = idx.shape[0] if batched_idx else 1
    flat = idx.reshape(b_i, -1).astype(jnp.int32)
    n = flat.shape[1]
    if n % block != 0:
        flat = _pad_to(flat, block, axis=1)
    return flat.reshape(b_i, -1, 128), n


def _pallas_gather(table2, idx3, shared: bool):
    """table2 (B, nb) × idx3 (B_i, rows, 128) -> (B, rows*128) values."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbatch = table2.shape[0]
    # Mosaic requires SMEM block sublanes divisible by 8 (or the full
    # array): stream the table in 8-row tiles for batched calls.
    tb_rows = 1 if nbatch == 1 else 8
    table_pad = _pad_to(_pad_to(table2, 128, axis=1), tb_rows, axis=0)
    rows = idx3.shape[1]
    grid_i = rows // _BLOCK_ROWS
    lo, hi = _block_ranges(idx3)
    # lo/hi ride as scalar-prefetch operands (full arrays in SMEM,
    # indexed by grid position inside the kernel).
    idx_map = (
        (lambda b, i, lo, hi: (0, i, 0)) if shared
        else (lambda b, i, lo, hi: (b, i, 0))
    )
    out = pl.pallas_call(
        _make_gather_kernel(shared, tb_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbatch, grid_i),
            in_specs=[
                pl.BlockSpec((1, _BLOCK_ROWS, 128), idx_map,
                             memory_space=pltpu.VMEM),
                # stream one tb_rows-tile of the small table through
                # SMEM; the kernel reads this step's row with scalar
                # loads in the bin loop
                pl.BlockSpec((tb_rows, table_pad.shape[1]),
                             lambda b, i, lo, hi: (b // tb_rows, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, _BLOCK_ROWS, 128),
                                   lambda b, i, lo, hi: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nbatch, rows, 128), table2.dtype),
        interpret=_INTERPRET,
    )(lo, hi, idx3, table_pad)
    return out.reshape(nbatch, -1)


def _pallas_scatter(cot2, idx3, npad, shared: bool):
    """cot2 (B, n) × idx3 (B_i, rows, 128) -> (B, npad) per-bin sums."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbatch = cot2.shape[0]
    rows = idx3.shape[1]
    grid_i = rows // _BLOCK_ROWS
    cot4 = cot2.reshape(nbatch, rows, 128)
    lo, hi = _block_ranges(idx3)
    idx_map = (
        (lambda b, i, lo, hi: (0, i, 0)) if shared
        else (lambda b, i, lo, hi: (b, i, 0))
    )
    out = pl.pallas_call(
        _make_scatter_kernel(shared),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbatch, grid_i),
            in_specs=[
                pl.BlockSpec((1, _BLOCK_ROWS, 128), idx_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _BLOCK_ROWS, 128),
                             lambda b, i, lo, hi: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, npad, 1), lambda b, i, lo, hi: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((npad, 128), cot2.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((nbatch, npad, 1), cot2.dtype),
        interpret=_INTERPRET,
    )(lo, hi, idx3, cot4)
    return out.reshape(nbatch, npad)


# -- MXU one-hot chunk kernels (wide-span mid-size tables) -----------------
#
# For unbinned mode tables (1024 < nb <= 4096) the per-block [min, max]
# spans are wide (~2000 of 3238 bins at 128^2), so the select loop pays
# O(span) sequential scalar iterations.  These kernels instead sweep the
# span in 128-bin chunks: build the chunk's one-hot mask with a single
# broadcast compare and contract it against the table (gather) or the
# cotangent (scatter) on the MXU — ~span/128 matmuls instead of ~span
# scalar-load iterations, and the batch rides the matmul M dimension for
# free.  Layouts put the grid axis leading so every block keeps Mosaic's
# (8, 128)-tiled last two dimensions.

_MXU_LANES = 4096  # flat elements per grid block (32 vregs wide)


def _make_gather_mxu_kernel(n_rows: int):
    from jax import lax
    from jax.experimental import pallas as pl

    def kernel(lo_ref, hi_ref, idx_ref, table_ref, out_ref):
        i = pl.program_id(0)
        ids = idx_ref[0]  # (1, LANES) int32
        c0 = (lo_ref[i] // 128) * 128
        nch = (hi_ref[i] + 1 - c0 + 127) // 128

        def body(j, acc):
            c = c0 + j * 128
            iota = lax.broadcasted_iota(
                jnp.int32, (128, _MXU_LANES), 0
            ) + c
            mask = (iota == ids).astype(acc.dtype)  # (128, LANES)
            tch = table_ref[:, pl.dslice(c, 128)]  # (n_rows, 128)
            # HIGHEST: the one-hot contraction is a *selection* — the
            # multi-pass bf16 decomposition reproduces each f32 value
            # exactly against the 0/1 mask, where the default single
            # pass would truncate the table to bf16.
            return acc + jnp.dot(
                tch, mask, preferred_element_type=acc.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

        out_ref[0] = lax.fori_loop(
            0, nch, body,
            jnp.zeros((n_rows, _MXU_LANES), out_ref.dtype),
        )

    return kernel


def _make_scatter_mxu_kernel():
    from jax import lax
    from jax.experimental import pallas as pl

    def kernel(lo_ref, hi_ref, idx_ref, cot_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        n_i = pl.num_programs(0)
        ids = idx_ref[0]  # (1, LANES)
        cot = cot_ref[0]  # (n_rows, LANES)

        @pl.when(i == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        c0 = (lo_ref[i] // 128) * 128
        nch = (hi_ref[i] + 1 - c0 + 127) // 128

        def body(j, _):
            c = c0 + j * 128
            iota = lax.broadcasted_iota(
                jnp.int32, (128, _MXU_LANES), 0
            ) + c
            mask = (iota == ids).astype(cot.dtype)  # (128, LANES)
            # contract the element axis: (n_rows, LANES) x (128, LANES);
            # HIGHEST so each cotangent enters the bin sum at full f32
            part = lax.dot_general(
                cot, mask, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_ref.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )  # (n_rows, 128)
            acc_ref[:, pl.dslice(c, 128)] = (
                acc_ref[:, pl.dslice(c, 128)] + part
            )
            return 0

        lax.fori_loop(0, nch, body, 0)

        @pl.when(i == n_i - 1)
        def _finalize():
            out_ref[...] = acc_ref[...]

    return kernel


def _mxu_idx_layout(idx):
    """Flatten/pad a shared index map to (n_blocks, 1, LANES) + block
    [lo, hi] ranges; everything static, folded at compile time."""
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    flat = _pad_to(flat, _MXU_LANES, value=0)
    idxb = flat.reshape(-1, 1, _MXU_LANES)
    lo = jnp.min(idxb, axis=(1, 2)).astype(jnp.int32)
    hi = jnp.max(idxb, axis=(1, 2)).astype(jnp.int32)
    return idxb, lo, hi, n


def _pallas_gather_mxu(table2, idx):
    """table2 (B, nb) x shared idx -> (B, n) via one-hot MXU chunks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbatch, nb = table2.shape
    n_rows = int(-(-nbatch // 8) * 8)  # pad batch to sublane tiles
    table_pad = _pad_to(_pad_to(table2, 128, axis=1), n_rows, axis=0)
    idxb, lo, hi, n = _mxu_idx_layout(idx)
    n_blocks = idxb.shape[0]
    out = pl.pallas_call(
        _make_gather_mxu_kernel(n_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1, _MXU_LANES),
                             lambda i, lo, hi: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(table_pad.shape,
                             lambda i, lo, hi: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n_rows, _MXU_LANES),
                                   lambda i, lo, hi: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, n_rows, _MXU_LANES), table2.dtype
        ),
        interpret=_INTERPRET,
    )(lo, hi, idxb, table_pad)
    # (n_blocks, n_rows, LANES) -> (B, n)
    out = jnp.moveaxis(out, 1, 0).reshape(n_rows, -1)[:nbatch, :n]
    return out


def _pallas_scatter_mxu(cot2, idx, nb):
    """cot2 (B, n) x shared idx -> (B, nb) per-bin sums via MXU chunks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbatch = cot2.shape[0]
    npad = int(-(-nb // 128) * 128)
    n_rows = int(-(-nbatch // 8) * 8)  # pad batch to sublane tiles
    idxb, lo, hi, n = _mxu_idx_layout(idx)
    n_blocks = idxb.shape[0]
    cot_pad = _pad_to(
        _pad_to(cot2, n_blocks * _MXU_LANES, axis=1), n_rows, axis=0
    )
    # (n_rows, n) -> (n_blocks, n_rows, LANES): grid axis leading
    cot_b = jnp.moveaxis(
        cot_pad.reshape(n_rows, n_blocks, _MXU_LANES), 0, 1
    )
    out = pl.pallas_call(
        _make_scatter_mxu_kernel(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 1, _MXU_LANES),
                             lambda i, lo, hi: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_rows, _MXU_LANES),
                             lambda i, lo, hi: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_rows, npad),
                                   lambda i, lo, hi: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_rows, npad), cot2.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, npad), cot2.dtype),
        interpret=_INTERPRET,
    )(lo, hi, idxb, cot_b)
    return out[:nbatch, :nb]


#: MXU-path bounds: mid-size tables only (narrow-span small tables keep
#: the cheaper select loop; above, XLA), shared float index maps, and a
#: grid small enough that the scatter's lane-major relayout stays cheap.
_MXU_MAX_ELEMS = 1 << 21


def _use_mxu(nb, n_elems, dtype, batched_idx):
    if batched_idx or not (_on_tpu() or _INTERPRET):
        return False
    if not (SMALL_TABLE_MAX_BINS < nb <= WIDE_TABLE_MAX_BINS):
        return False
    if n_elems > _MXU_MAX_ELEMS:
        return False
    # f32 only on real TPU (see _use_pallas): f64 rides the XLA route
    return jnp.issubdtype(dtype, jnp.floating) and (
        jnp.dtype(dtype).itemsize <= 4 or _INTERPRET
    )


def _on_tpu():
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


# -- primitive -----------------------------------------------------------
#
# bin_gather_p :: table (B, nb), idx -> (B, *event_shape)
# With batched_idx=False, idx has shape event_shape shared by every batch
# row; with batched_idx=True, idx has shape (B, *event_shape) and row b
# gathers with its own index map.  The wrapper presents the unbatched
# (nb,) -> idx.shape view; vmap folds extra axes onto B.

bin_gather_p = jax.extend.core.Primitive("bin_gather")


def _use_pallas(nb, nbatch=1, dtype=None):
    if not (_on_tpu() or _INTERPRET):
        return False
    # f64 tables (the x64/mixed accuracy mode) take the XLA route on
    # real TPU: the kernels are built for the f32 speed path, and f64
    # Pallas lowering trips a jax-internal recursion on this backend.
    # Interpret mode (CPU tests) handles f64 fine.
    if dtype is not None and jnp.dtype(dtype).itemsize > 4 and not _INTERPRET:
        return False
    cap = SMALL_TABLE_MAX_BINS if nbatch > 1 else WIDE_TABLE_MAX_BINS
    return nb <= cap


def _gather_impl(table, idx, *, batched_idx=False):
    nbatch, nb = table.shape
    event = idx.shape[1:] if batched_idx else idx.shape
    n_elems = int(np.prod(event, dtype=np.int64)) if event else 1
    if _use_mxu(nb, n_elems, table.dtype, batched_idx):
        return _pallas_gather_mxu(table, idx).reshape((nbatch,) + event)
    if not _use_pallas(nb, nbatch, table.dtype):
        if batched_idx:
            return jax.vmap(lambda t, i_: jnp.take(t, i_, axis=0))(table, idx)
        return jnp.take(table, idx, axis=1)
    block = _BLOCK_ROWS * 128
    idx3, n = _norm_idx(idx, batched_idx, block)
    out = _pallas_gather(table, idx3, shared=not batched_idx)
    return out[:, :n].reshape((nbatch,) + event)


def _deterministic_scatter(cot, idx, nb):
    """Mesh-independent per-bin segment sums: per-row (trailing-axes)
    segment sums are local and deterministic; the leading (possibly
    mesh-sharded) axis is then reduced with a fixed fold-halving tree.
    Association depends only on shapes — never on the device mesh."""
    nbatch = cot.shape[0]
    if idx.ndim < 2:
        idx2 = idx.reshape(1, -1)
    else:
        idx2 = idx.reshape(idx.shape[0], -1)
    cot3 = cot.reshape(nbatch, idx2.shape[0], idx2.shape[1])
    per_row = jax.vmap(  # over batch
        jax.vmap(  # over rows
            lambda c, i: jax.ops.segment_sum(c, i, num_segments=nb),
            in_axes=(0, 0),
        ),
        in_axes=(0, None),
    )(cot3, idx2)  # (B, rows, nb)

    def fold(z):  # (rows, nb) -> (nb,)
        n = z.shape[0]
        while n > 1:
            m = n // 2
            f = z[:m] + z[m : 2 * m]
            if n % 2:
                f = jnp.concatenate([f, z[2 * m :]])
            z = f
            n = z.shape[0]
        return z[0]

    return jax.vmap(fold)(per_row)


def _scatter_impl(cot, idx, nb, *, batched_idx=False):
    """Per-bin segment sums: cot (B, *event) -> (B, nb)."""
    from .. import config as _config

    nbatch = cot.shape[0]
    if _config.get("deterministic_reductions"):
        if batched_idx:
            return jax.vmap(
                lambda c, i_: _deterministic_scatter(c[None], i_, nb)[0]
            )(cot, idx)
        return _deterministic_scatter(cot, idx, nb)
    n_elems = int(np.prod(cot.shape[1:], dtype=np.int64))
    if _use_mxu(nb, n_elems, cot.dtype, batched_idx):
        return _pallas_scatter_mxu(cot.reshape(nbatch, -1), idx, nb)
    scatter_cap = SCATTER_MAX_BINS if nbatch > 1 else WIDE_TABLE_MAX_BINS
    if not (
        (_on_tpu() or _INTERPRET)
        and nb <= scatter_cap
        # f64 -> XLA on real TPU (see _use_pallas)
        and (jnp.dtype(cot.dtype).itemsize <= 4 or _INTERPRET)
    ):
        if batched_idx:
            return jax.vmap(
                lambda c, i_: jax.ops.segment_sum(
                    c.reshape(-1), i_.reshape(-1), num_segments=nb
                )
            )(cot, idx)
        seg = jax.vmap(
            lambda c: jax.ops.segment_sum(c, idx.reshape(-1), num_segments=nb)
        )
        return seg(cot.reshape(nbatch, -1))
    npad = int(-(-nb // 128) * 128)
    cot_flat = cot.reshape(nbatch, -1)
    block = _BLOCK_ROWS * 128
    n = cot_flat.shape[1]
    if n % block != 0:
        # pad cotangent with zeros and indices with an out-of-range bin
        cot_flat = _pad_to(cot_flat, block, axis=1, value=0)
    b_i = idx.shape[0] if batched_idx else 1
    idx_flat = idx.reshape(b_i, -1).astype(jnp.int32)
    if idx_flat.shape[1] % block != 0:
        idx_flat = _pad_to(idx_flat, block, axis=1, value=npad - 1)
    idx3 = idx_flat.reshape(b_i, -1, 128)
    out = _pallas_scatter(cot_flat, idx3, npad, shared=not batched_idx)
    return out[:, :nb]


def _abstract_eval(table, idx, *, batched_idx=False):
    event = idx.shape[1:] if batched_idx else idx.shape
    return jax.core.ShapedArray((table.shape[0],) + event, table.dtype)


def _jvp_rule(primals, tangents, *, batched_idx=False):
    table, idx = primals
    t_dot, _ = tangents
    out = bin_gather_p.bind(table, idx, batched_idx=batched_idx)
    if isinstance(t_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, bin_gather_p.bind(t_dot, idx, batched_idx=batched_idx)


def _transpose_rule(ct, table, idx, *, batched_idx=False):
    assert ad.is_undefined_primal(table) and not ad.is_undefined_primal(idx)
    nb = table.aval.shape[1]
    if isinstance(ct, ad.Zero):
        return ad.Zero(table.aval), None
    out = bin_scatter_p.bind(ct, idx, nb=nb, batched_idx=batched_idx)
    return out.astype(table.aval.dtype), None


def _batching_rule(args, dims, *, batched_idx=False):
    table, idx = args
    tdim, idim = dims
    if idim is not None and tdim is not None:
        # Both batched along the same vmap axis (arises when linearize's
        # partial-eval residualizes the index map per sample).
        table = jnp.moveaxis(table, tdim, 0)  # (Bv, B, nb)
        idx = jnp.moveaxis(idx, idim, 0)  # (Bv, *idx_shape)
        bv, b0, nb = table.shape
        if b0 == 1 and not batched_idx:
            # the common case (the wrapper always binds B=1): pair the
            # vmap axis with the table batch natively — per-batch index
            # maps, bin axis untouched
            out = bin_gather_p.bind(
                table.reshape(bv, nb), idx, batched_idx=True
            )
            return out[:, None], 0  # (Bv, 1, *event) — restore B axis
        # rare nested case: fold the vmap axis into the bin axis and
        # offset each batch member's indices into its own table slice —
        # one unbatched bind with exact per-batch semantics (wide tables
        # fall back to XLA inside the impl).
        if batched_idx:
            # idx (Bv, B, *event): fold Bv into B with offsets per Bv
            tables = jnp.moveaxis(table, 0, 1).reshape(b0, bv * nb)
            offs = jnp.arange(bv, dtype=idx.dtype) * nb
            offs = offs.reshape((bv, 1) + (1,) * (idx.ndim - 2))
            idx_off = jnp.moveaxis(idx + offs, 0, 1)  # (B, Bv, *event)
            idx_off = idx_off.reshape((b0, bv) + idx.shape[2:])
            out = bin_gather_p.bind(tables, idx_off, batched_idx=True)
            return out.reshape((b0, bv) + idx.shape[2:]), 1
        tables = jnp.moveaxis(table, 0, 1).reshape(b0, bv * nb)
        offs = jnp.arange(bv, dtype=idx.dtype) * nb
        offs = offs.reshape((bv,) + (1,) * (idx.ndim - 1))
        out = bin_gather_p.bind(tables, idx + offs)  # (B, Bv, *ish)
        return out, 1
    if idim is not None:
        idx = jnp.moveaxis(idx, idim, 0)
        if batched_idx:
            # per-batch indices re-batched: idx (Bv, B, *event) — pair
            # every (Bv, B) combination with a broadcast table row
            bv = idx.shape[0]
            b0, nb0 = table.shape
            table_b = jnp.broadcast_to(table[None], (bv, b0, nb0))
            out = bin_gather_p.bind(
                table_b.reshape(bv * b0, nb0),
                idx.reshape((bv * b0,) + idx.shape[2:]),
                batched_idx=True,
            )
            return out.reshape((bv, b0) + idx.shape[2:]), 0
        # batched indices with a shared table: fold the batch axis into
        # the (arbitrary) index shape; the semantics coincide.
        out = bin_gather_p.bind(table, idx)
        return out, 1  # (B_table, B_idx, *rest) — idx batch lands at axis 1
    table = jnp.moveaxis(table, tdim, 0)
    bv, b0, nb = table.shape
    if batched_idx:
        # new batch axis over table only; every (bv) member shares the
        # per-b0 index maps — tile the index maps across the new axis
        idxb = jnp.broadcast_to(idx[None], (bv,) + idx.shape)
        out = bin_gather_p.bind(
            table.reshape(bv * b0, nb),
            idxb.reshape((bv * b0,) + idx.shape[1:]),
            batched_idx=True,
        )
        return out.reshape((bv, b0) + idx.shape[1:]), 0
    out = bin_gather_p.bind(table.reshape(bv * b0, nb), idx)
    return out.reshape((bv, b0) + idx.shape), 0


bin_gather_p.def_impl(_gather_impl)
bin_gather_p.def_abstract_eval(_abstract_eval)
ad.primitive_jvps[bin_gather_p] = _jvp_rule
ad.primitive_transposes[bin_gather_p] = _transpose_rule
batching.primitive_batchers[bin_gather_p] = _batching_rule
mlir.register_lowering(
    bin_gather_p, mlir.lower_fun(_gather_impl, multiple_results=False)
)


# -- scatter primitive (the gather's exact transpose) ----------------------
#
# bin_scatter_p :: cot (B, *event), idx (*event) or (B, *event) -> (B, nb);
# per-bin segment sums.  A first-class primitive so that transforms applied
# to a *transposed* gather (e.g. `jax.linearize` of a metric that contains
# a vjp, as in the geoVI sample update) never look inside the Pallas kernel.

bin_scatter_p = jax.extend.core.Primitive("bin_scatter")


def _scatter_abstract_eval(cot, idx, *, nb, batched_idx=False):
    del idx
    return jax.core.ShapedArray((cot.shape[0], nb), cot.dtype)


def _scatter_jvp_rule(primals, tangents, *, nb, batched_idx=False):
    cot, idx = primals
    c_dot, _ = tangents
    out = bin_scatter_p.bind(cot, idx, nb=nb, batched_idx=batched_idx)
    if isinstance(c_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, bin_scatter_p.bind(c_dot, idx, nb=nb, batched_idx=batched_idx)


def _scatter_transpose_rule(ct, cot, idx, *, nb, batched_idx=False):
    assert ad.is_undefined_primal(cot) and not ad.is_undefined_primal(idx)
    if isinstance(ct, ad.Zero):
        return ad.Zero(cot.aval), None
    out = bin_gather_p.bind(ct, idx, batched_idx=batched_idx)
    return out.astype(cot.aval.dtype), None


def _scatter_batching_rule(args, dims, *, nb, batched_idx=False):
    cot, idx = args
    cdim, idim = dims
    if idim is not None and cdim is not None and not batched_idx:
        # both batched: pair them natively when the primary batch is 1
        # (the wrapper always binds B=1); otherwise fall through to the
        # offset-fold path below.
        cot_m = jnp.moveaxis(cot, cdim, 0)  # (Bv, B, *event)
        idx_m = jnp.moveaxis(idx, idim, 0)  # (Bv, *event)
        bv, b0 = cot_m.shape[:2]
        if b0 == 1:
            out = bin_scatter_p.bind(
                cot_m.reshape((bv,) + cot_m.shape[2:]), idx_m,
                nb=nb, batched_idx=True,
            )
            return out[:, None], 0
    if idim is not None:
        # batched indices: offset each batch member's bins into its own
        # slice of a widened output, then unfold.
        idx = jnp.moveaxis(idx, idim, 0)  # (Bv, *ish)
        bv = idx.shape[0]
        if batched_idx:
            # re-batched per-batch index maps: idx (Bv, B, *event) — fold
            # (Bv, B) into one batch axis, pairing each combination with
            # its cotangent row (mirrors the gather rule's fallback).
            b0 = idx.shape[1]
            if cdim is not None:
                cot = jnp.moveaxis(cot, cdim, 0)  # (Bv, B, *event)
            else:
                cot = jnp.broadcast_to(cot[None], (bv,) + cot.shape)
            out = bin_scatter_p.bind(
                cot.reshape((bv * b0,) + cot.shape[2:]),
                idx.reshape((bv * b0,) + idx.shape[2:]),
                nb=nb, batched_idx=True,
            )
            return out.reshape(bv, b0, nb), 0
        offs = jnp.arange(bv, dtype=idx.dtype) * nb
        offs = offs.reshape((bv,) + (1,) * (idx.ndim - 1))
        idx_off = idx + offs
        if cdim is not None:
            cot = jnp.moveaxis(cot, cdim, 1)  # (B, Bv, *ish)
        else:
            cot = jnp.broadcast_to(
                cot[:, None], (cot.shape[0], bv) + cot.shape[1:]
            )
        out = bin_scatter_p.bind(cot, idx_off, nb=bv * nb)
        b0 = out.shape[0]
        return out.reshape(b0, bv, nb), 1
    # cot-only batching: fold the vmap axis into the primitive batch axis
    cot = jnp.moveaxis(cot, cdim, 0)  # (Bv, B, *ish)
    bv, b0 = cot.shape[:2]
    if batched_idx:
        idxb = jnp.broadcast_to(idx[None], (bv,) + idx.shape)
        out = bin_scatter_p.bind(
            cot.reshape((bv * b0,) + cot.shape[2:]),
            idxb.reshape((bv * b0,) + idx.shape[1:]),
            nb=nb, batched_idx=True,
        )
        return out.reshape(bv, b0, nb), 0
    out = bin_scatter_p.bind(
        cot.reshape((bv * b0,) + cot.shape[2:]), idx, nb=nb
    )
    return out.reshape(bv, b0, nb), 0


bin_scatter_p.def_impl(
    lambda cot, idx, *, nb, batched_idx=False: _scatter_impl(
        cot, idx, nb, batched_idx=batched_idx
    )
)
bin_scatter_p.def_abstract_eval(_scatter_abstract_eval)
ad.primitive_jvps[bin_scatter_p] = _scatter_jvp_rule
ad.primitive_transposes[bin_scatter_p] = _scatter_transpose_rule
batching.primitive_batchers[bin_scatter_p] = _scatter_batching_rule
mlir.register_lowering(
    bin_scatter_p,
    mlir.lower_fun(
        lambda cot, idx, *, nb, batched_idx=False: _scatter_impl(
            cot, idx, nb, batched_idx=batched_idx
        ),
        multiple_results=False,
    ),
)


# -- static-index primitives ------------------------------------------------
#
# The index map of a power/DOF distributor is a *model constant*.  Binding
# it as a traced operand lets `jax.linearize` under `vmap` residualize a
# per-sample copy (the "both-batched" case), which forces the slower
# batched-index kernels or XLA.  These twin primitives instead carry the
# map as a hashable *parameter*: the only operand is the table/cotangent,
# so every vmap is table-only and the shared-index TPU kernels (select
# loop or MXU one-hot) always apply, batch riding the kernel's grid/M
# dimension.


class StaticIndexMap:
    """Host index array as a hashable primitive parameter.

    Hash and equality both derive from the array *content* (a blake2b
    digest of the raw bytes plus shape/dtype), so two wrappers built from
    equal arrays are interchangeable in JAX's param-keyed trace caches —
    equal implies equal hash at any size.  The digest is computed once at
    construction (~10 ms per 100 MB), which only happens per distinct map.
    """

    __slots__ = ("arr", "_digest", "_hash")

    def __init__(self, arr):
        arr = np.ascontiguousarray(arr)
        arr.setflags(write=False)
        self.arr = arr
        h = hashlib.blake2b(digest_size=16)
        h.update(arr.view(np.uint8).reshape(-1).data)
        self._digest = (arr.shape, arr.dtype.str, h.digest())
        self._hash = hash(self._digest)

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        if not isinstance(other, StaticIndexMap):
            return NotImplemented
        if self.arr is other.arr:
            return True
        return self._digest == other._digest and np.array_equal(
            self.arr, other.arr
        )


#: Bounded id-keyed wrapper cache: models re-trace with the same host
#: index array object; reusing the wrapper skips the content digest and
#: avoids re-copying multi-MB maps.  LRU-bounded so user code feeding a
#: stream of distinct concrete index arrays cannot grow it without limit
#: (runtime-varying index maps should be passed as traced jnp arrays,
#: which bypass this path entirely).
_STATIC_IDX_CACHE: "OrderedDict" = OrderedDict()
_STATIC_IDX_CACHE_MAX = 128


def _as_static_idx(arr) -> "StaticIndexMap":
    key = id(arr)
    hit = _STATIC_IDX_CACHE.get(key)
    if hit is not None and hit[0] is arr:
        _STATIC_IDX_CACHE.move_to_end(key)
        return hit[1]
    wrapped = StaticIndexMap(np.asarray(arr))
    _STATIC_IDX_CACHE[key] = (arr, wrapped)
    while len(_STATIC_IDX_CACHE) > _STATIC_IDX_CACHE_MAX:
        _STATIC_IDX_CACHE.popitem(last=False)
    return wrapped


bin_gather_s_p = jax.extend.core.Primitive("bin_gather_static")
bin_scatter_s_p = jax.extend.core.Primitive("bin_scatter_static")


def _gather_s_impl(table, *, idx):
    return _gather_impl(table, jnp.asarray(idx.arr))


def _gather_s_abstract(table, *, idx):
    return jax.core.ShapedArray(
        (table.shape[0],) + idx.arr.shape, table.dtype
    )


def _gather_s_jvp(primals, tangents, *, idx):
    (table,) = primals
    (t_dot,) = tangents
    out = bin_gather_s_p.bind(table, idx=idx)
    if isinstance(t_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, bin_gather_s_p.bind(t_dot, idx=idx)


def _gather_s_transpose(ct, table, *, idx):
    assert ad.is_undefined_primal(table)
    nb = table.aval.shape[1]
    if isinstance(ct, ad.Zero):
        return (ad.Zero(table.aval),)
    out = bin_scatter_s_p.bind(ct, idx=idx, nb=nb)
    return (out.astype(table.aval.dtype),)


def _gather_s_batching(args, dims, *, idx):
    (table,) = args
    (tdim,) = dims
    table = jnp.moveaxis(table, tdim, 0)
    bv, b0, nb = table.shape
    out = bin_gather_s_p.bind(table.reshape(bv * b0, nb), idx=idx)
    return out.reshape((bv, b0) + idx.arr.shape), 0


bin_gather_s_p.def_impl(_gather_s_impl)
bin_gather_s_p.def_abstract_eval(_gather_s_abstract)
ad.primitive_jvps[bin_gather_s_p] = _gather_s_jvp
ad.primitive_transposes[bin_gather_s_p] = _gather_s_transpose
batching.primitive_batchers[bin_gather_s_p] = _gather_s_batching
mlir.register_lowering(
    bin_gather_s_p, mlir.lower_fun(_gather_s_impl, multiple_results=False)
)


def _scatter_s_impl(cot, *, idx, nb):
    return _scatter_impl(cot, jnp.asarray(idx.arr), nb)


def _scatter_s_abstract(cot, *, idx, nb):
    return jax.core.ShapedArray((cot.shape[0], nb), cot.dtype)


def _scatter_s_jvp(primals, tangents, *, idx, nb):
    (cot,) = primals
    (c_dot,) = tangents
    out = bin_scatter_s_p.bind(cot, idx=idx, nb=nb)
    if isinstance(c_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, bin_scatter_s_p.bind(c_dot, idx=idx, nb=nb)


def _scatter_s_transpose(ct, cot, *, idx, nb):
    assert ad.is_undefined_primal(cot)
    if isinstance(ct, ad.Zero):
        return (ad.Zero(cot.aval),)
    return (bin_gather_s_p.bind(ct, idx=idx).astype(cot.aval.dtype),)


def _scatter_s_batching(args, dims, *, idx, nb):
    (cot,) = args
    (cdim,) = dims
    cot = jnp.moveaxis(cot, cdim, 0)
    bv, b0 = cot.shape[:2]
    out = bin_scatter_s_p.bind(
        cot.reshape((bv * b0,) + cot.shape[2:]), idx=idx, nb=nb
    )
    return out.reshape(bv, b0, nb), 0


bin_scatter_s_p.def_impl(_scatter_s_impl)
bin_scatter_s_p.def_abstract_eval(_scatter_s_abstract)
ad.primitive_jvps[bin_scatter_s_p] = _scatter_s_jvp
ad.primitive_transposes[bin_scatter_s_p] = _scatter_s_transpose
batching.primitive_batchers[bin_scatter_s_p] = _scatter_s_batching
mlir.register_lowering(
    bin_scatter_s_p, mlir.lower_fun(_scatter_s_impl, multiple_results=False)
)


def bin_gather(table, idx, nbins=None):
    """``table[idx]`` for a small 1-D table with a fast TPU path.

    ``idx`` may have any shape; when it is a host constant (the usual
    case — distributor maps are static model data) it rides as a
    primitive *parameter*, so vmapped ``jax.linearize`` can never
    residualize it per sample.  The op is linear in ``table`` with the
    per-bin segment sum as its exact transpose, safe under ``jit``/
    ``vmap``/``jax.linearize``/``jax.linear_transpose``/``grad``.
    """
    if table.ndim != 1:
        raise ValueError("bin_gather expects a 1-D table; vmap for batches")
    if isinstance(idx, StaticIndexMap):
        return bin_gather_s_p.bind(table[None], idx=idx)[0]
    if not isinstance(idx, jax.core.Tracer):
        return bin_gather_s_p.bind(table[None], idx=_as_static_idx(idx))[0]
    return bin_gather_p.bind(table[None], jnp.asarray(idx))[0]


# -- sorted-adjoint gather (huge unbinned tables) ---------------------------
#
# For grid-scale distributor maps (1.2M unique modes at 4096^2) the
# forward XLA gather with the index map as a RUNTIME ARGUMENT runs at
# bandwidth speed (~0.06 ms for 4.2M elements on this chip), but its
# autodiff transpose — XLA scatter-add — costs ~36 ms regardless of how
# the indices ride.  The distributor's occurrences sorted by bin are
# contiguous segments, so with a host-precomputed sorting permutation the
# exact transpose is ``segment_sum(cot[perm], sorted_ids,
# indices_are_sorted=True)`` — measured 0.04-0.08 ms (docs/perf.md).
# Registered as a primitive pair so jvp/linearize/linear_transpose all
# preserve the fast adjoint (the metric matvec applies it per CG step).

sorted_gather_p = jax.extend.core.Primitive("sorted_bin_gather")
sorted_scatter_p = jax.extend.core.Primitive("sorted_bin_scatter")


def sorted_bin_gather(table, idx, perm, sorted_ids):
    """``table[idx]`` whose transpose is the sorted-segment sum.

    ``perm`` is ``argsort(idx.ravel())`` and ``sorted_ids`` its image —
    both precomputed on host and shipped as runtime buffers
    (``Model.consts``) next to ``idx``.
    """
    return sorted_gather_p.bind(table, idx, perm, sorted_ids)


def _sorted_gather_impl(table, idx, perm, sorted_ids):
    del perm, sorted_ids
    return table[idx]


# Chunk size for the sorted-adjoint scatter at grid scale.  Both
# single-shot formulations (segment_sum and cumsum) deterministically
# fault the TPU worker inside large fused programs once the occurrence
# count passes ~4M elements, while the 2048^2 quarter map (1.05M) runs
# fine — so the large-map route splits the perm-gather + segment-sum
# into static chunks of this many elements each and adds the partial
# tables.  Every op then sits at a scale measured to work.
_SORTED_CHUNK = 1 << 21


def _sorted_scatter_chunked(flat, perm, sorted_ids, nb, dtype, chunk):
    n = perm.shape[0]
    k = -(-n // chunk)
    pad = k * chunk - n
    if pad:
        perm = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
        sorted_ids = jnp.concatenate(
            [sorted_ids, jnp.full((pad,), nb, sorted_ids.dtype)]
        )
    out = jnp.zeros((nb,), dtype)
    for i in range(k):
        ids = sorted_ids[i * chunk:(i + 1) * chunk]
        v = flat[perm[i * chunk:(i + 1) * chunk]]
        if pad and i == k - 1:
            v = jnp.where(ids >= nb, jnp.zeros((), dtype), v)
            ids = jnp.minimum(ids, nb - 1)
        out = out + jax.ops.segment_sum(
            v, ids, num_segments=nb, indices_are_sorted=True
        )
    return out


def _sorted_scatter_impl(cot, idx, perm, sorted_ids, *, nb):
    del idx
    import os

    if os.environ.get("NIFTY_SORTED_SCATTER") == "cumsum":
        # debugging escape: cumulative-sum + boundary-difference variant
        # (same cost class, avoids XLA's sorted-segment reduction path)
        cs = jnp.concatenate([
            jnp.zeros((1,), cot.dtype), jnp.cumsum(cot.ravel()[perm])
        ])
        bins = jnp.arange(nb, dtype=sorted_ids.dtype)
        starts = jnp.searchsorted(sorted_ids, bins)
        ends = jnp.searchsorted(sorted_ids, bins + 1)
        return cs[ends] - cs[starts]
    chunk = int(os.environ.get("NIFTY_SORTED_CHUNK", _SORTED_CHUNK))
    if perm.shape[0] > chunk:
        return _sorted_scatter_chunked(
            cot.ravel(), perm, sorted_ids, nb, cot.dtype, chunk
        )
    return jax.ops.segment_sum(
        cot.ravel()[perm], sorted_ids, num_segments=nb,
        indices_are_sorted=True,
    )


sorted_gather_p.def_impl(_sorted_gather_impl)
sorted_gather_p.def_abstract_eval(
    lambda table, idx, perm, sorted_ids: jax.core.ShapedArray(
        idx.shape, table.dtype
    )
)
sorted_scatter_p.def_impl(
    lambda cot, idx, perm, sorted_ids, *, nb: _sorted_scatter_impl(
        cot, idx, perm, sorted_ids, nb=nb
    )
)
sorted_scatter_p.def_abstract_eval(
    lambda cot, idx, perm, sorted_ids, *, nb: jax.core.ShapedArray(
        (nb,), cot.dtype
    )
)


def _sorted_gather_jvp(primals, tangents):
    table, idx, perm, sorted_ids = primals
    t_dot = tangents[0]
    out = sorted_gather_p.bind(table, idx, perm, sorted_ids)
    if isinstance(t_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, sorted_gather_p.bind(t_dot, idx, perm, sorted_ids)


def _sorted_gather_transpose(ct, table, idx, perm, sorted_ids):
    assert ad.is_undefined_primal(table)
    if isinstance(ct, ad.Zero):
        return ad.Zero(table.aval), None, None, None
    nb = table.aval.shape[0]
    out = sorted_scatter_p.bind(ct, idx, perm, sorted_ids, nb=nb)
    return out.astype(table.aval.dtype), None, None, None


def _sorted_scatter_jvp(primals, tangents, *, nb):
    cot, idx, perm, sorted_ids = primals
    c_dot = tangents[0]
    out = sorted_scatter_p.bind(cot, idx, perm, sorted_ids, nb=nb)
    if isinstance(c_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, sorted_scatter_p.bind(c_dot, idx, perm, sorted_ids, nb=nb)


def _sorted_scatter_transpose(ct, cot, idx, perm, sorted_ids, *, nb):
    assert ad.is_undefined_primal(cot)
    if isinstance(ct, ad.Zero):
        return ad.Zero(cot.aval), None, None, None
    out = sorted_gather_p.bind(ct, idx, perm, sorted_ids)
    return out.astype(cot.aval.dtype), None, None, None


def _sorted_gather_batching(args, dims):
    table, idx, perm, sorted_ids = args
    td, idim, pd, sd = dims
    assert idim is None and pd is None and sd is None, "index maps are shared"
    table = jnp.moveaxis(table, td, 0)
    out = jnp.stack([
        sorted_gather_p.bind(table[i], idx, perm, sorted_ids)
        for i in range(table.shape[0])
    ])
    return out, 0


def _sorted_scatter_batching(args, dims, *, nb):
    cot, idx, perm, sorted_ids = args
    cd, idim, pd, sd = dims
    assert idim is None and pd is None and sd is None, "index maps are shared"
    cot = jnp.moveaxis(cot, cd, 0)
    out = jnp.stack([
        sorted_scatter_p.bind(cot[i], idx, perm, sorted_ids, nb=nb)
        for i in range(cot.shape[0])
    ])
    return out, 0


ad.primitive_jvps[sorted_gather_p] = _sorted_gather_jvp
ad.primitive_transposes[sorted_gather_p] = _sorted_gather_transpose
batching.primitive_batchers[sorted_gather_p] = _sorted_gather_batching
mlir.register_lowering(
    sorted_gather_p,
    mlir.lower_fun(_sorted_gather_impl, multiple_results=False),
)
ad.primitive_jvps[sorted_scatter_p] = _sorted_scatter_jvp
ad.primitive_transposes[sorted_scatter_p] = _sorted_scatter_transpose
batching.primitive_batchers[sorted_scatter_p] = _sorted_scatter_batching
mlir.register_lowering(
    sorted_scatter_p,
    mlir.lower_fun(
        lambda cot, idx, perm, sorted_ids, *, nb: _sorted_scatter_impl(
            cot, idx, perm, sorted_ids, nb=nb
        ),
        multiple_results=False,
    ),
)


def sorted_scatter_aux(idx) -> dict:
    """Host-precomputed auxiliary arrays for the sorted-adjoint gather."""
    flat = np.asarray(idx).ravel()
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    return {"perm": perm, "sorted_ids": flat[perm].astype(np.int32)}


def distribute_power(table, idx, sorted_aux=None):
    """Power/amplitude distributor: small-table fast path, else XLA gather.

    The single entry point the correlated field uses; keeps one code path
    on CPU (plain gather) and picks the Pallas kernel on TPU only when the
    table is small enough for the select loop to win.  ``sorted_aux``
    (dict with ``perm``/``sorted_ids``, see :func:`sorted_scatter_aux`)
    activates the sorted-adjoint route for grid-scale runtime index maps.
    """
    from .. import config as _config

    import os as _os

    if (
        sorted_aux is not None
        and isinstance(idx, jax.core.Tracer)
        and not _config.get("deterministic_reductions")
        and not _use_pallas(table.shape[0], dtype=table.dtype)
        # ≥2^22-entry maps (the 4096² quarter grid) deterministically
        # fault the TPU worker inside large fused programs with either
        # sorted-adjoint formulation (segment_sum and cumsum variants) —
        # and, measured this round, ALSO with the scatter chunked into
        # 2^21- or 2^20-element pieces, so the fault is not the op size
        # but the sorted route inside that program at that scale (an
        # XLA/runtime defect; the same ops run standalone at full
        # speed).  Big maps fall back to the XLA scatter route;
        # ≤2048² unbinned keeps the fast sorted adjoint.
        # `NIFTY_SORTED_SCATTER=chunked` opts big maps in for probing.
        and (
            idx.size < (1 << 22)
            or _os.environ.get("NIFTY_SORTED_SCATTER") == "chunked"
        )
        and _os.environ.get("NIFTY_SORTED_SCATTER") != "off"
    ):
        return sorted_bin_gather(
            table, idx, sorted_aux["perm"], sorted_aux["sorted_ids"]
        )

    if isinstance(idx, jax.core.Tracer):
        # Traced index maps (models carrying the distributor as a runtime
        # `consts` leaf — the memory-safe route for grid-sized maps) still
        # get the TPU kernels via the *dynamic* primitive whenever the
        # table qualifies; and in deterministic mode the primitive's
        # fixed-association scatter transpose keeps the mesh-independence
        # promise (XLA's autodiff scatter-add would not).
        if table.ndim == 1 and (
            _use_pallas(table.shape[0], dtype=table.dtype)
            or _use_mxu(table.shape[0], idx.size, table.dtype, False)
            or _config.get("deterministic_reductions")
        ):
            return bin_gather(table, idx)
        return table[idx]
    if table.ndim == 1 and (
        _use_pallas(table.shape[0], dtype=table.dtype)
        or _use_mxu(table.shape[0], np.asarray(idx).size, table.dtype, False)
        # Deterministic mode: the primitive's transpose routes through the
        # fixed-association scatter for *any* table size (the XLA
        # fallback's autodiff scatter-add is mesh-dependent).
        or _config.get("deterministic_reductions")
    ):
        return bin_gather(table, _as_static_idx(idx))
    idx = np.asarray(idx) if not isinstance(idx, jax.Array) else idx
    return table[idx]
