"""Mesh-native parallelism: sample-axis and field-axis sharding.

The reference parallelizes with MPI (sample parallelism via ``shareRange``
rank partitioning + deterministic pairwise ``allreduce_sum``,
``src/utilities.py:331-391``, ``src/minimization/kl_energies.py:140-158``).
The TPU-native equivalent is a single global ``jax.sharding.Mesh`` whose
axes carry both parallelism dimensions of this workload:

- ``"samples"`` — data parallelism over antithetic posterior samples: the
  stacked residual arrays of a :class:`~nifty_tpu.evi.Samples` put their
  leading axis on this mesh axis; KL value/grad/metric mean-reductions
  become XLA all-reduces over ICI.
- ``"field"`` — sharding of large field axes (the analog of sequence/
  context parallelism): harmonic-space excitations are sharded along their
  first axis; XLA inserts all-to-all transposes for the sharded FFT.

Everything goes through ``jit`` + ``NamedSharding`` constraints — no
manual collectives — so single-chip and multi-chip run the same program.
For run-to-run and mesh-size-independent summation the fixed-order
pairwise tree reduction :func:`pairwise_mean` mirrors the reference's
deterministic allreduce.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax import numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map

from ..evi import Samples


def make_mesh(
    samples: int = 1,
    field: int = 1,
    *,
    devices: Optional[Sequence] = None,
    sample_axis: str = "samples",
    field_axis: str = "field",
) -> Mesh:
    """Build a 2-D device mesh ``samples × field``.

    On a multi-host pod slice, lay the ``field`` axis innermost so FFT
    all-to-alls ride ICI within a host's chips while the sample axis spans
    hosts (cheap mean-reductions over DCN).
    """
    devices = jax.devices() if devices is None else list(devices)
    n = samples * field
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(samples, field)
    return Mesh(dev, (sample_axis, field_axis))


def _field_spec(ndim: int, field_axis: str, leading: int = 0):
    """PartitionSpec sharding the first post-leading axis over ``field``."""
    if ndim <= leading:
        return P()
    return P(*([None] * leading + [field_axis] + [None] * (ndim - leading - 1)))


def shard_position(pos, mesh: Mesh, *, field_axis: str = "field",
                   min_ndim: int = 2):
    """Place a latent position on the mesh: leaves with >= ``min_ndim``
    dimensions get their first axis sharded over ``field`` (when divisible);
    the rest replicate."""
    fdim = mesh.shape[field_axis]

    def put(x):
        if jnp.ndim(x) >= min_ndim and x.shape[0] % fdim == 0:
            spec = _field_spec(jnp.ndim(x), field_axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return tree_map(put, pos)


def shard_samples(samples: Samples, mesh: Mesh, *,
                  sample_axis: str = "samples",
                  field_axis: str = "field") -> Samples:
    """Place a :class:`Samples` on the mesh: residual leading axis over
    ``samples``, large field axes over ``field``, position replicated over
    ``samples`` but field-sharded."""
    sdim = mesh.shape[sample_axis]

    def put_resid(x):
        spec = [None] * jnp.ndim(x)
        if x.shape[0] % sdim == 0:
            spec[0] = sample_axis
        if jnp.ndim(x) >= 3 and x.shape[1] % mesh.shape[field_axis] == 0:
            spec[1] = field_axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    pos = (
        shard_position(samples.pos, mesh, field_axis=field_axis)
        if samples.pos is not None else None
    )
    resid = (
        tree_map(put_resid, samples._samples)
        if samples._samples is not None else None
    )
    return Samples(pos=pos, samples=resid, keys=samples.keys)


def pairwise_sum(x, axis: int = 0):
    """Fixed-order binary-tree reduction along ``axis``.

    The summation order is a function of the array length only — never of
    the device mesh — so results are bitwise reproducible across mesh
    sizes, inheriting the invariant the reference enforces with its
    deterministic MPI allreduce (``src/utilities.py:332-339``; tested by
    running the same problem under 1 and 2 ranks,
    ``test/test_mpi/test_kl.py``).
    """
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    while n > 1:
        m = n // 2
        even = x[: 2 * m : 2]
        odd = x[1 : 2 * m : 2]
        rest = x[2 * m :]
        x = jnp.concatenate([even + odd, rest], axis=0)
        n = x.shape[0]
    return x[0]


def pairwise_mean(x, axis: int = 0):
    return pairwise_sum(x, axis=axis) / x.shape[axis]


def tree_pairwise_mean(tree, axis: int = 0):
    """Deterministic sample-mean reduction for KL value/grad/metric trees;
    drop-in for the default ``tree_map(mean)`` reduce of ``OptimizeVI``."""
    return tree_map(partial(pairwise_mean, axis=axis), tree)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Multi-host initialization (jax.distributed), replacing the
    reference's ``MPI.COMM_WORLD`` discovery (``src/utilities.py:295``)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
