"""Worker for the multi-process (multi-host analog) invariance test.

Each of N processes owns 4 virtual CPU devices; together they form a
global ``samples × field`` mesh spanning process boundaries (the DCN
analog).  The worker runs one fused linear-path OptimizeVI update of a
64² correlated field with the pencil Hartley and writes the all-gathered
result from process 0.

Run (by ``tests/test_multiprocess.py``):
    python multiprocess_worker.py <num_procs> <proc_id> <port> <outdir>

Parity: the reference runs its suite under ``mpiexec -n 2`` and asserts
1-rank ≡ N-rank results (``/root/reference/.gitlab-ci.yml:50-55``,
``test/test_mpi/test_kl.py``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

num_procs, proc_id, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

_flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=4"]
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

if num_procs > 1:
    from nifty_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils

import nifty_tpu as jft
from nifty_tpu.ops.distributed_fft import distributed_hartley
from nifty_tpu.parallel import shard_position

assert len(jax.devices()) == 4 * num_procs

mesh_shape = (2, 2 * num_procs)
devs = np.array(jax.devices()).reshape(mesh_shape)
mesh = jax.sharding.Mesh(devs, ("samples", "field"))

dims = (64, 64)
data = np.random.default_rng(42).normal(size=dims)

cfm = jft.CorrelatedFieldMaker("cf")
cfm.set_amplitude_total_offset(offset_mean=1.0, offset_std=(1e-1, 3e-2))
cfm.add_fluctuations(
    dims, distances=1.0 / dims[0], fluctuations=(1.0, 5e-1),
    loglogavgslope=(-3.0, 2e-1), flexibility=(1e0, 5e-1),
    asperity=(5e-1, 5e-2),
)
cf = cfm.finalize(hartley_fn=lambda x, axes=None: distributed_hartley(x, mesh))
lh = jft.Gaussian(jnp.asarray(data), noise_cov_inv=lambda x: x).amend(cf)
lh = jax.tree_util.tree_map(
    lambda x: shard_position(x, mesh) if hasattr(x, "ndim") else x, lh
)
pos = shard_position(jft.random_like(jax.random.PRNGKey(1), lh.domain), mesh)

opt = jft.OptimizeVI(lh, n_total_iterations=1)
state = opt.init_state(
    jax.random.PRNGKey(7),
    n_samples=2,
    draw_linear_kwargs=dict(cg_kwargs=dict(maxiter=200, absdelta=1e-13)),
    kl_kwargs=dict(minimize_kwargs=dict(
        xtol=1e-9, maxiter=30, cg_kwargs=dict(maxiter=150))),
    sample_mode="linear_resample",
)
samples = jft.Samples(pos=pos, samples=None, keys=None)
samples, state = opt.update(samples, state)

energy = float(state.minimization_state.fun)
gathered = {
    k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
    for k, v in samples.samples.items()
}
if proc_id == 0:
    np.savez(
        os.path.join(outdir, f"result_np{num_procs}.npz"),
        energy=energy, **gathered,
    )
    print("OK", energy)
