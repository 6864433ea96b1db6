"""Worker process for tests/test_distributed.py (NOT a pytest module).

Runs the sharded-map pipeline over a (2,2) mesh whose 4 devices span
`num_processes` processes, then rank 0 writes the trajectory. Invoked:

    python distributed_worker.py <rank> <num_processes> <port> <out.npy>

With num_processes=1 the same program runs single-process (4 local
devices) — the parity baseline the test compares against.
"""

import os
import sys

rank = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scrub the parent's forced host-device count (conftest) — the per-process
# simulated device count is set via jax_num_cpu_devices in initialize()
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(f for f in flags.split()
                 if "force_host_platform_device_count" not in f)
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from svnicp_tpu.parallel import distributed  # noqa: E402

distributed.initialize(f"127.0.0.1:{port}", n_procs, rank,
                       local_device_count=4 // n_procs)
assert len(jax.devices()) == 4, jax.devices()

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from svnicp_tpu import config as cfg_mod  # noqa: E402
from svnicp_tpu.core import imu as imu_mod  # noqa: E402
from svnicp_tpu.io import datasets  # noqa: E402
from svnicp_tpu.runtime import pipeline as pl  # noqa: E402

# the dryrun_multichip exact-parity operating point (see __graft_entry__):
# point-to-point + topk candidates + f64 keeps the single- vs multi-
# process divergence down to collective-reduction rounding
cfg = cfg_mod.PipelineConfig(
    icp=cfg_mod.SteinICPConfig(
        particle_count=8, iterations=30, lr=1.0, max_dist=2.8, knn_count=16,
        early_stop=True, convergence_threshold=5e-4,
        candidate_method="topk",
        source_capacity=128, target_capacity=16384,
    ),
    map=cfg_mod.MapConfig(voxel_size=1.0, max_points_per_voxel=5,
                          max_range=100.0, capacity=16384,
                          sharded=True, rebalance_every=2,
                          rebalance_sample=64),
    preprocess=cfg_mod.PreprocessConfig(min_range=0.5, max_range=40.0,
                                        voxel_size=1.0, raw_capacity=4096),
    lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
    sharding=cfg_mod.ShardingConfig(particle_axis=2, point_axis=2),
    dtype="float64",
)

world = datasets.SyntheticWorld(extent=30.0, seed=1)
times, rots, trans = datasets.synthetic_trajectory(5, dt=0.1, speed=1.0,
                                                   seed=1)
scan_rng = np.random.default_rng(1)
scans = [world.scan_at(scan_rng, rots[i], trans[i], n_points=2000)
         for i in range(5)]
imu = list(datasets.synthetic_imu(times, rots, trans, imu_mod.GRAVITY))

from svnicp_tpu.core import geometry as geo  # noqa: E402
import jax.numpy as jnp  # noqa: E402

delta_r = np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.0, 0.04])), np.float64)
delta_t = np.asarray([0.3, -0.2, 0.1], np.float64)

with jax.enable_x64(True):
    pipe = pl.LIOPipeline(cfg)
    for t, acc, gyro in imu:
        pipe.feed_imu(t, acc, gyro)
    for i in range(5):
        pipe.feed_scan(float(times[i]), scans[i])
        if i == 2:
            # mid-run distributed re-anchor: the rigid map move re-keys per
            # block and migrates rows over the ring pass — in the 2-process
            # run the migration crosses the process boundary
            pipe.apply_reanchor(delta_r, delta_t)
    assert pipe.reanchors == 1
    traj = pipe.trajectory()

if jax.process_index() == 0:
    np.save(out_path, traj)
    print(f"worker rank {rank}/{n_procs}: wrote {out_path}", flush=True)
distributed.shutdown()
