"""Small-table gather as a first-class JAX primitive with a Pallas TPU path.

The correlated field distributes a small amplitude spectrum onto every
harmonic mode: ``amp_full = amp[dist]`` with a *static* index map.  XLA
lowers this to a slow general gather on TPU (measured ~7 ms for a 1024²
grid vs ~0.02 ms for the FFT it feeds — the dominant cost of the CF
forward pass; reference equivalent: the ``PowerDistributor`` matrix-free
operator, ``src/operators/distributors.py:31``).  The Pallas kernel
computes the same gather as a blocked compare-and-select reduction
entirely in VMEM — O(nbins) VPU ops per element but no HBM-indirect
addressing — with the table held in SMEM for scalar broadcast loads.

``bin_gather`` is registered as a custom primitive so every transform the
framework relies on composes:

- **JVP** (``jax.linearize`` in the Newton-CG hessian-vector product and
  the likelihood metric): the op is linear in ``table`` — the tangent is
  the same gather of the tangent table.
- **Transpose** (``jax.linear_transpose`` in the metric, VJPs): the exact
  per-bin segment sum, implemented by a Pallas scatter-accumulate kernel.
- **Batching** (``vmap`` over posterior samples): leading batch axes of
  ``table`` collapse onto the kernel's batch grid dimension — per-element
  cost stays O(nbins), not O(B·nbins).

The select loop costs O(nbins) per element, so the kernel is gated on
:data:`SMALL_TABLE_MAX_BINS`; above it (e.g. the 83k unique modes of a
1024² grid) XLA's gather wins and is used instead.  Off-TPU the
primitive lowers to the plain XLA gather/segment-sum.
"""

from __future__ import annotations

import os

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
SMALL_TABLE_MAX_BINS = 1024
SCATTER_MAX_BINS = 1024


def _pad_to(x, mult, axis=0, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# -- kernels -------------------------------------------------------------

def _gather_kernel(lo_ref, hi_ref, idx_ref, table_ref, out_ref):
    from jax import lax
    from jax.experimental import pallas as pl

    ids = idx_ref[:]  # (BR, 128) int32
    bidx = pl.program_id(0)  # table lives whole in SMEM; index the batch row
    i = pl.program_id(1)  # ranges live whole in SMEM; index the block row

    # Mosaic-safe select-accumulate: loop over the *static bin range of
    # this block* (log-binned index maps are locally narrow) with scalar
    # loads and 2-D vector compare/select only.
    def body(b, acc):
        val = table_ref[bidx, b]
        return acc + jnp.where(ids == b, val, 0.0)

    out_ref[0] = lax.fori_loop(
        lo_ref[i], hi_ref[i] + 1, body,
        jnp.zeros(ids.shape, dtype=out_ref.dtype),
    )


def _scatter_kernel(lo_ref, hi_ref, idx_ref, cot_ref, out_ref, acc_ref):
    """Per-bin segment sums with deferred cross-lane reduction.

    Per block and bin only a sublane partial-sum lands in a VMEM
    accumulator row (``acc[b, lane] += Σ_sublanes``); the expensive
    cross-lane reduction happens ONCE per batch row at the final grid
    step.  Like the gather, the bin loop covers only the block's static
    [min, max] index range.
    """
    from jax import lax
    from jax.experimental import pallas as pl

    ids = idx_ref[:]  # (BR, 128)
    cot = cot_ref[0]  # (BR, 128)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    @pl.when(i == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(b, _):
        part = jnp.sum(
            jnp.where(ids == b, cot, 0.0), axis=0, keepdims=True
        )  # (1, 128) lane partials
        acc_ref[pl.dslice(b, 1), :] = acc_ref[pl.dslice(b, 1), :] + part
        return 0

    lax.fori_loop(lo_ref[i], hi_ref[i] + 1, body, 0)

    @pl.when(i == n_i - 1)
    def _finalize():
        out_ref[0] = jnp.sum(acc_ref[...], axis=1, keepdims=True)


def _block_ranges(idx2):
    """Per-(BR,128)-block [min, max] of the index map.

    The index map is a static model constant, so XLA folds these
    reductions at compile time — the kernel's bin loops become
    effectively-static narrow ranges at zero runtime cost.
    """
    blocks = idx2.reshape(-1, _BLOCK_ROWS * 128)
    lo = jnp.min(blocks, axis=1).astype(jnp.int32)
    hi = jnp.max(blocks, axis=1).astype(jnp.int32)
    return lo, hi


def _pallas_gather(table2, idx_flat_pad):
    """table2 (B, nb) × flat padded idx -> (B, n) gathered values."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbatch = table2.shape[0]
    table_pad = _pad_to(table2, 128, axis=1)
    n = idx_flat_pad.shape[0]
    rows = n // 128
    grid_i = rows // _BLOCK_ROWS
    idx2 = idx_flat_pad.reshape(rows, 128)
    lo, hi = _block_ranges(idx2)
    # lo/hi ride as scalar-prefetch operands (full 1-D arrays in SMEM,
    # indexed by grid position inside the kernel).
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbatch, grid_i),
            in_specs=[
                pl.BlockSpec((_BLOCK_ROWS, 128), lambda b, i, lo, hi: (i, 0),
                             memory_space=pltpu.VMEM),
                # the small table lives whole in SMEM (all batch rows): the
                # kernel reads it with scalar loads inside the bin loop;
                # Mosaic requires non-final block dims be 1 or the full dim
                pl.BlockSpec((nbatch, table_pad.shape[1]),
                             lambda b, i, lo, hi: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, _BLOCK_ROWS, 128),
                                   lambda b, i, lo, hi: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nbatch, rows, 128), table2.dtype),
        interpret=_INTERPRET,
    )(lo, hi, idx2, table_pad)
    return out.reshape(nbatch, -1)


def _pallas_scatter(cot2, idx_flat_pad, npad):
    """cot2 (B, n) × flat padded idx -> (B, npad) per-bin sums."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nbatch = cot2.shape[0]
    n = idx_flat_pad.shape[0]
    rows = n // 128
    grid_i = rows // _BLOCK_ROWS
    idx2 = idx_flat_pad.reshape(rows, 128)
    cot3 = cot2.reshape(nbatch, rows, 128)
    lo, hi = _block_ranges(idx2)
    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbatch, grid_i),
            in_specs=[
                pl.BlockSpec((_BLOCK_ROWS, 128), lambda b, i, lo, hi: (i, 0),
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
    )(lo, hi, idx2, cot3)
    return out.reshape(nbatch, npad)


def _on_tpu():
    try:
        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


# -- primitive -----------------------------------------------------------
#
# bin_gather_p :: table (B, nb), idx (any shape, int) -> (B, *idx.shape)
# The wrapper presents the unbatched (nb,) -> idx.shape view; vmap over
# table folds extra axes into B.

bin_gather_p = jax.extend.core.Primitive("bin_gather")


def _use_pallas(nb):
    return (_on_tpu() or _INTERPRET) and nb <= SMALL_TABLE_MAX_BINS


def _gather_impl(table, idx):
    nbatch, nb = table.shape
    if not _use_pallas(nb):
        return jnp.take(table, idx, axis=1)
    idx_flat = idx.reshape(-1).astype(jnp.int32)
    n = idx_flat.shape[0]
    block = _BLOCK_ROWS * 128
    if n % block != 0:
        idx_flat = _pad_to(idx_flat, block, value=0)
    out = _pallas_gather(table, idx_flat)
    return out[:, :n].reshape((nbatch,) + idx.shape)


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


def _scatter_impl(cot, idx, nb):
    """Per-bin segment sums: cot (B, *idx.shape) -> (B, nb)."""
    from .. import config as _config

    nbatch = cot.shape[0]
    if _config.get("deterministic_reductions"):
        return _deterministic_scatter(cot, idx, nb)
    if not ((_on_tpu() or _INTERPRET) and nb <= SCATTER_MAX_BINS):
        seg = jax.vmap(
            lambda c: jax.ops.segment_sum(c, idx.reshape(-1), num_segments=nb)
        )
        return seg(cot.reshape(nbatch, -1))
    npad = int(-(-nb // 128) * 128)
    idx_flat = idx.reshape(-1).astype(jnp.int32)
    cot_flat = cot.reshape(nbatch, -1)
    n = idx_flat.shape[0]
    block = _BLOCK_ROWS * 128
    if n % block != 0:
        # pad cotangent with zeros and indices with an out-of-range bin
        idx_flat = _pad_to(idx_flat, block, value=npad - 1)
        cot_flat = _pad_to(cot_flat, block, axis=1, value=0)
    out = _pallas_scatter(cot_flat, idx_flat, npad)
    return out[:, :nb]


def _abstract_eval(table, idx):
    return jax.core.ShapedArray((table.shape[0],) + idx.shape, table.dtype)


def _jvp_rule(primals, tangents):
    table, idx = primals
    t_dot, _ = tangents
    out = bin_gather_p.bind(table, idx)
    if isinstance(t_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, bin_gather_p.bind(t_dot, idx)


def _transpose_rule(ct, table, idx):
    assert ad.is_undefined_primal(table) and not ad.is_undefined_primal(idx)
    nb = table.aval.shape[1]
    if isinstance(ct, ad.Zero):
        return ad.Zero(table.aval), None
    out = bin_scatter_p.bind(ct, idx, nb=nb)
    return out.astype(table.aval.dtype), None


def _batching_rule(args, dims):
    table, idx = args
    tdim, idim = dims
    if idim is not None and tdim is not None:
        # Both batched along the same vmap axis (arises when linearize's
        # partial-eval residualizes the index map per sample): fold the
        # vmap axis into the bin axis and offset each batch member's
        # indices into its own table slice — one unbatched bind with
        # exact per-batch semantics.
        table = jnp.moveaxis(table, tdim, 0)  # (Bv, B, nb)
        idx = jnp.moveaxis(idx, idim, 0)  # (Bv, *ish)
        bv, b0, nb = table.shape
        tables = jnp.moveaxis(table, 0, 1).reshape(b0, bv * nb)
        offs = jnp.arange(bv, dtype=idx.dtype) * nb
        offs = offs.reshape((bv,) + (1,) * (idx.ndim - 1))
        out = bin_gather_p.bind(tables, idx + offs)  # (B, Bv, *ish)
        return out, 1
    if idim is not None:
        # batched indices: fold the batch axis into the (arbitrary) index
        # shape; with a shared table the semantics coincide.
        idx = jnp.moveaxis(idx, idim, 0)
        out = bin_gather_p.bind(table, idx)
        return out, 1  # (B_table, B_idx, *rest) — idx batch lands at axis 1
    table = jnp.moveaxis(table, tdim, 0)
    bv, b0, nb = table.shape
    out = bin_gather_p.bind(table.reshape(bv * b0, nb), idx)
    return out.reshape((bv, b0) + idx.shape), 0


bin_gather_p.def_impl(lambda table, idx: _gather_impl(table, idx))
bin_gather_p.def_abstract_eval(_abstract_eval)
ad.primitive_jvps[bin_gather_p] = _jvp_rule
ad.primitive_transposes[bin_gather_p] = _transpose_rule
batching.primitive_batchers[bin_gather_p] = _batching_rule
mlir.register_lowering(
    bin_gather_p, mlir.lower_fun(_gather_impl, multiple_results=False)
)


# -- scatter primitive (the gather's exact transpose) ----------------------
#
# bin_scatter_p :: cot (B, *ish), idx (*ish) -> (B, nb); per-bin segment
# sums.  A first-class primitive so that transforms applied to a
# *transposed* gather (e.g. `jax.linearize` of a metric that contains a
# vjp, as in the geoVI sample update) never look inside the Pallas kernel.

bin_scatter_p = jax.extend.core.Primitive("bin_scatter")


def _scatter_abstract_eval(cot, idx, *, nb):
    del idx
    return jax.core.ShapedArray((cot.shape[0], nb), cot.dtype)


def _scatter_jvp_rule(primals, tangents, *, nb):
    cot, idx = primals
    c_dot, _ = tangents
    out = bin_scatter_p.bind(cot, idx, nb=nb)
    if isinstance(c_dot, ad.Zero):
        return out, ad.Zero(jax.core.get_aval(out).to_tangent_aval())
    return out, bin_scatter_p.bind(c_dot, idx, nb=nb)


def _scatter_transpose_rule(ct, cot, idx, *, nb):
    assert ad.is_undefined_primal(cot) and not ad.is_undefined_primal(idx)
    if isinstance(ct, ad.Zero):
        return ad.Zero(cot.aval), None
    return bin_gather_p.bind(ct, idx).astype(cot.aval.dtype), None


def _scatter_batching_rule(args, dims, *, nb):
    cot, idx = args
    cdim, idim = dims
    if idim is not None:
        # batched indices: offset each batch member's bins into its own
        # slice of a widened output, then unfold.
        idx = jnp.moveaxis(idx, idim, 0)  # (Bv, *ish)
        bv = idx.shape[0]
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
    out = bin_scatter_p.bind(
        cot.reshape((bv * b0,) + cot.shape[2:]), idx, nb=nb
    )
    return out.reshape(bv, b0, nb), 0


bin_scatter_p.def_impl(lambda cot, idx, *, nb: _scatter_impl(cot, idx, nb))
bin_scatter_p.def_abstract_eval(_scatter_abstract_eval)
ad.primitive_jvps[bin_scatter_p] = _scatter_jvp_rule
ad.primitive_transposes[bin_scatter_p] = _scatter_transpose_rule
batching.primitive_batchers[bin_scatter_p] = _scatter_batching_rule
mlir.register_lowering(
    bin_scatter_p,
    mlir.lower_fun(
        lambda cot, idx, *, nb: _scatter_impl(cot, idx, nb),
        multiple_results=False,
    ),
)


def bin_gather(table, idx, nbins=None):
    """``table[idx]`` for a small 1-D table with a fast TPU path.

    ``idx`` may have any shape (and is typically a static host constant);
    the op is linear in ``table`` with the per-bin segment sum as its
    exact transpose, safe under ``jit``/``vmap``/``jax.linearize``/
    ``jax.linear_transpose``/``grad``.
    """
    idx = jnp.asarray(idx)
    if table.ndim != 1:
        raise ValueError("bin_gather expects a 1-D table; vmap for batches")
    return bin_gather_p.bind(table[None], idx)[0]


def distribute_power(table, idx):
    """Power/amplitude distributor: small-table fast path, else XLA gather.

    The single entry point the correlated field uses; keeps one code path
    on CPU (plain gather) and picks the Pallas kernel on TPU only when the
    table is small enough for the select loop to win.
    """
    from .. import config as _config

    idx = np.asarray(idx) if not isinstance(idx, jax.Array) else idx
    if table.ndim == 1 and (
        _use_pallas(table.shape[0])
        # Deterministic mode: the primitive's transpose routes through the
        # fixed-association scatter for *any* table size (the XLA
        # fallback's autodiff scatter-add is mesh-dependent).
        or _config.get("deterministic_reductions")
    ):
        return bin_gather(table, idx)
    return table[idx]
