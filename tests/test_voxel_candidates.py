"""Voxel-hash bucket correspondence tests: coverage guarantee + pipeline run."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from svnicp_tpu import config as cfg_mod
from svnicp_tpu.core import pointcloud as pc
from svnicp_tpu.core import voxmap
from svnicp_tpu.io import datasets, metrics
from svnicp_tpu.runtime import pipeline as pl


def build_map(rng, n=2000, extent=20.0, voxel=1.0, cap=5):
    m = voxmap.create(8192)
    pts = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    m, _ = voxmap.insert(m, pc.from_numpy(pts, 4096), jnp.eye(3), jnp.zeros(3),
                         voxel, cap, 1000.0)
    return m, pts


def test_nn_within_voxel_is_covered(rng):
    m, pts = build_map(rng, voxel=1.0, cap=20)
    q = rng.uniform(-18, 18, size=(200, 3)).astype(np.float32)
    cand, valid = voxmap.voxel_candidates(m, jnp.asarray(q), jnp.ones(200, bool),
                                          1.0, 20)
    cand = np.asarray(cand)
    valid = np.asarray(valid)
    map_pts = np.asarray(m.points)[np.asarray(m.valid)]
    for i in range(200):
        d = np.linalg.norm(map_pts - q[i], axis=1)
        nn = map_pts[d.argmin()]
        if d.min() < 1.0:  # coverage guarantee radius = voxel size
            got = cand[i][valid[i]]
            assert (np.linalg.norm(got - nn, axis=1) < 1e-5).any(), i


def test_respects_per_voxel_cap_and_validity(rng):
    m, _ = build_map(rng, cap=20)
    q = rng.uniform(-18, 18, size=(50, 3)).astype(np.float32)
    cand, valid = voxmap.voxel_candidates(m, jnp.asarray(q), jnp.ones(50, bool), 1.0, 3)
    assert cand.shape == (50, 81, 3)
    # no candidate may be farther than the 27-neighborhood diagonal
    got = np.asarray(cand)
    ok = np.asarray(valid)
    d = np.linalg.norm(got - q[:, None, :], axis=-1)
    assert (d[ok] < np.sqrt(3) * 2.0 + 1.0).all()
    # invalid query -> no candidates
    _, v2 = voxmap.voxel_candidates(m, jnp.asarray(q), jnp.zeros(50, bool), 1.0, 3)
    assert not np.asarray(v2).any()


def test_pipeline_with_voxel_correspondence(rng):
    cfg = cfg_mod.PipelineConfig(
        icp=cfg_mod.SteinICPConfig(particle_count=8, iterations=25, knn_count=16,
                                   candidate_method="voxel", voxel_candidate_cap=4,
                                   max_dist=2.8, source_capacity=1024,
                                   target_capacity=8192),
        map=cfg_mod.MapConfig(voxel_size=1.0, max_points_per_voxel=10,
                              max_range=120.0, capacity=32768),
        preprocess=cfg_mod.PreprocessConfig(min_range=1.0, max_range=50.0,
                                            raw_capacity=8192),
        lio=cfg_mod.LIOConfig(estimator="icp", frame_gap_seconds=0.0),
    )
    world = datasets.SyntheticWorld(extent=40.0, seed=3)
    times, rots, trans = datasets.synthetic_trajectory(10, dt=0.1, speed=1.2, seed=5)
    pipe = pl.LIOPipeline(cfg)
    for i in range(10):
        pipe.feed_scan(float(times[i]),
                       world.scan_at(rng, rots[i], trans[i], n_points=4000, noise=0.01))
    gt = np.tile(np.eye(4), (10, 1, 1))
    gt[:, :3, :3] = rots
    gt[:, :3, 3] = trans
    ate = metrics.ate_rmse(pipe.trajectory(), gt, align="first")
    assert ate < 0.15, f"voxel-correspondence ATE {ate}"
