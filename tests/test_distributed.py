"""Multi-process distributed runtime (parallel/distributed.py).

SURVEY.md §5: the TPU equivalent of the reference's DDS transport is the
jax.distributed runtime over a hosts x chips mesh. A single-process
simulated mesh never exercises process bring-up, cross-process
collectives, or the SPMD staging contract — so this test spawns REAL
processes (CPU backend, gloo collectives) and asserts trajectory parity:

  2 processes x 2 local devices  ==  1 process x 4 local devices

over the sharded-map pipeline (ring candidate gathers, rebalances and the
Newton psum all cross the process boundary in the 2-process run).
"""

import os
import socket
import subprocess
import sys

import numpy as np
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(n_procs: int, out_path: str, timeout: float = 600.0):
    port = _free_port()
    env = dict(os.environ)
    # children must not inherit a pinned non-CPU platform
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(n_procs), str(port),
             out_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for rank in range(n_procs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker rank {rank}/{n_procs} rc={p.returncode}\n{out[-4000:]}")
    return outs


def test_two_process_sharded_map_parity(tmp_path):
    multi = str(tmp_path / "traj_2proc.npy")
    single = str(tmp_path / "traj_1proc.npy")
    _run(2, multi)
    _run(1, single)
    t2 = np.load(multi)
    t1 = np.load(single)
    assert t2.shape == t1.shape == (5, 4, 4)
    assert np.isfinite(t2).all()
    drift = np.linalg.norm(t2[:, :3, 3] - t1[:, :3, 3], axis=1)
    assert drift.max() < 1e-4, f"multi-process trajectory drift {drift}"
