"""Distributed (pencil-decomposed) FFT / Hartley over a mesh axis.

The reference never shards a single field's transform across processes
(SURVEY §2.8 P7 — the capability this framework *adds*).  Strategy: for a
field sharded along its first axis on mesh axis ``field``,

    1. FFT all non-sharded axes locally,
    2. ``all_to_all`` transpose (rows ↔ columns slabs) over ICI,
    3. FFT the previously-sharded axis locally,
    4. ``all_to_all`` back to the original sharding.

All compute is local contiguous FFTs (CPU/TPU friendly); the only
communication is two tiled all-to-alls, which on TPU ride ICI.  This is
the standard pencil decomposition used by large-scale FFT libraries,
expressed with ``jax.shard_map`` so it composes with jit/vjp/vmap.

The transforms are linear and self-transposing in the same way as their
dense counterparts, so autodiff through ``shard_map`` yields the correct
(equally distributed) adjoints.
"""

from __future__ import annotations

from functools import partial
import jax
from jax import lax
from jax import numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import config


def _local_fftn_sharded0(x, axis_name: str):
    """Complex FFT over *all* axes of a globally (axis-0)-sharded array;
    runs inside ``shard_map`` on local blocks of shape (nx/P, ...)."""
    nd = x.ndim
    if nd == 1:
        # 1-D: all_to_all to gather full vector slabs is equivalent to a
        # transpose with a dummy axis; use gather-based fallback.
        full = lax.all_gather(x, axis_name, axis=0, tiled=True)
        full = jnp.fft.fft(full)
        i = lax.axis_index(axis_name)
        return lax.dynamic_slice_in_dim(full, i * x.shape[0], x.shape[0], 0)
    other_axes = tuple(range(1, nd))
    f = jnp.fft.fftn(x, axes=other_axes)
    # Pick a transpose partner axis divisible by the mesh extent (prefer
    # the innermost for ICI-friendly contiguous messages).
    p = lax.axis_size(axis_name)
    t_axis = None
    for cand in range(nd - 1, 0, -1):
        if x.shape[cand] % p == 0:
            t_axis = cand
            break
    if t_axis is None:
        # No divisible axis: fall back to gathering the sharded axis.
        full = lax.all_gather(f, axis_name, axis=0, tiled=True)
        full = jnp.fft.fft(full, axis=0)
        i = lax.axis_index(axis_name)
        return lax.dynamic_slice_in_dim(full, i * x.shape[0], x.shape[0], 0)
    # rows -> slabs of the partner axis.
    f = lax.all_to_all(f, axis_name, split_axis=t_axis, concat_axis=0,
                       tiled=True)
    f = jnp.fft.fft(f, axis=0)
    # back to row sharding.
    f = lax.all_to_all(f, axis_name, split_axis=0, concat_axis=t_axis,
                       tiled=True)
    return f


def _local_hartley_sharded0(x, axis_name: str):
    f = _local_fftn_sharded0(x.astype(jnp.result_type(x.dtype, jnp.float32)),
                             axis_name)
    if config.get("hartley_convention") == "non_canonical_hartley":
        return f.real + f.imag
    return f.real - f.imag


def distributed_fftn(x, mesh: Mesh, axis_name: str = "field"):
    """n-D complex FFT of an array sharded along axis 0 of ``axis_name``."""
    spec = P(*([axis_name] + [None] * (x.ndim - 1)))
    fn = shard_map_fn(
        partial(_local_fftn_sharded0, axis_name=axis_name), mesh, spec
    )
    return fn(x)


def distributed_hartley(x, mesh: Mesh, axis_name: str = "field"):
    """Hartley transform of a real array sharded along axis 0."""
    spec = P(*([axis_name] + [None] * (x.ndim - 1)))
    fn = shard_map_fn(
        partial(_local_hartley_sharded0, axis_name=axis_name), mesh, spec
    )
    return fn(x)


def shard_map_fn(fn, mesh: Mesh, spec: P):
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec)
