"""Multi-process (multi-host analog) invariance: the fused linear-path VI
update over a mesh spanning TWO ``jax.distributed`` processes equals the
single-process result — the DCN-mesh analog of the reference's
``mpiexec -n 2`` CI invariant (``/root/reference/.gitlab-ci.yml:50-55``,
``test/test_mpi/test_kl.py``).

The workers run ``tests/multiprocess_worker.py``; each owns 4 virtual CPU
devices, so the 2-process run computes on a 2×4 global mesh with the
field-axis collectives crossing the process boundary.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(num_procs, port, outdir):
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(num_procs), str(i), str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(num_procs)
    ]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    return outs


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    _run_workers(2, port, str(tmp_path))
    _run_workers(1, _free_port(), str(tmp_path))

    two = np.load(tmp_path / "result_np2.npz")
    one = np.load(tmp_path / "result_np1.npz")
    # energy: same fixed point to reduction-order noise
    np.testing.assert_allclose(
        float(two["energy"]), float(one["energy"]), rtol=1e-8
    )
    for k in one.files:
        if k == "energy":
            continue
        # Cross-process collectives reassociate float sums; near the CG
        # absdelta threshold a 1-ulp difference can flip the stopping
        # branch, displacing latents by ~sqrt(absdelta) (observed max
        # 1.3e-5 in isolated pixels on this host) while the energy stays
        # at 1e-8.
        np.testing.assert_allclose(
            two[k], one[k], atol=5e-5,
            err_msg=f"cross-process mismatch in {k}",
        )
