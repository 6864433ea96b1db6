"""Map-block sharding as a live pipeline operating mode (BASELINE config 5).

The distributed map (parallel/voxmap_sharded) serving the odometry loop end
to end: sharded bootstrap insert, ring-gather candidates, sharded per-frame
insert, and online rebalancing — driven through LIOPipeline on the simulated
8-device CPU mesh. Parity target: the sharded-map trajectory matches the
replicated-map trajectory (same frames, same seeds) within centimetres; the
two paths differ only in candidate search composition (k_per-per-block ring
gather vs one global bucketed pass).

Reference semantics being distributed: VoxelHashMap insert/evict/cap
(ref: svn-icp/src/core/VoxelHashMap.cpp:22-61) applied per key-range block.
"""

import dataclasses

import numpy as np
import pytest

from svnicp_tpu import config as cfg_mod
from svnicp_tpu.io import datasets, metrics
from svnicp_tpu.runtime import pipeline as pl

from test_pipeline import run_sequence, small_cfg


@pytest.fixture(scope="module")
def world():
    return datasets.SyntheticWorld(extent=40.0, seed=3)


def sharded_cfg(particle_axis=2, point_axis=4, rebalance_every=0, **over):
    defaults = dict(
        map=cfg_mod.MapConfig(voxel_size=1.0, max_points_per_voxel=10,
                              max_range=120.0, capacity=32768, sharded=True,
                              rebalance_every=rebalance_every,
                              rebalance_sample=128),
        sharding=cfg_mod.ShardingConfig(particle_axis=particle_axis,
                                        point_axis=point_axis),
    )
    defaults.update(over)
    return small_cfg(**defaults)


class TestShardedMapPipelineMode:
    def test_tracks_ground_truth_on_2x4_mesh(self, world):
        cfg = sharded_cfg()
        pipe, gt = run_sequence(cfg, world, n_frames=8)
        assert pipe.mesh is not None and pipe.mesh.shape == {
            "particle": 2, "point": 4}
        est = pipe.trajectory()
        ate = metrics.ate_rmse(est, gt, align="first")
        assert ate < 0.12, f"sharded-map ATE {ate}"

    def test_parity_with_replicated_map(self, world):
        cfg_s = sharded_cfg()
        pipe_s, gt = run_sequence(cfg_s, world, n_frames=8)
        cfg_r = small_cfg()
        pipe_r, _ = run_sequence(cfg_r, world, n_frames=8)
        est_s, est_r = pipe_s.trajectory(), pipe_r.trajectory()
        # identical frames/seeds; only the candidate-search composition
        # differs — trajectories must agree to centimetres
        diff = np.linalg.norm(est_s[:, :3, 3] - est_r[:, :3, 3], axis=1)
        assert diff.max() < 0.06, f"sharded vs replicated drift {diff.max()}"

    def test_rebalance_in_the_loop(self, world):
        cfg = sharded_cfg(rebalance_every=3)
        pipe, gt = run_sequence(cfg, world, n_frames=7)
        assert pipe.rebalances == 3      # post-bootstrap + frames 3 and 6
        est = pipe.trajectory()
        ate = metrics.ate_rmse(est, gt, align="first")
        assert ate < 0.12, f"ATE after rebalances {ate}"
        # the map survived redistribution: later frames still see it
        assert int(pipe.outputs[-1].map_points) > int(pipe.outputs[0].map_points)

    def test_map_contents_match_replicated_insert(self, world):
        """The sharded map holds exactly the same resident voxel keys as the
        single-device map after identical frames (per-block semantics are
        unchanged; only the layout is distributed)."""
        cfg_s = sharded_cfg()
        pipe_s, _ = run_sequence(cfg_s, world, n_frames=4)
        cfg_r = small_cfg()
        pipe_r, _ = run_sequence(cfg_r, world, n_frames=4)
        from svnicp_tpu.core.pointcloud import INVALID_KEY

        ks = np.asarray(pipe_s.state.vmap.key)
        vs = np.asarray(pipe_s.state.vmap.valid)
        kr = np.asarray(pipe_r.state.vmap.key)
        vr = np.asarray(pipe_r.state.vmap.valid)
        keys_s = np.unique(ks[vs & (ks != INVALID_KEY)])
        keys_r = np.unique(kr[vr & (kr != INVALID_KEY)])
        # the two paths register with differently-composed candidate sets,
        # so poses differ at the cm level and boundary voxels shift; bulk
        # occupancy must still match (a layout/insert bug reads ~0.9 here,
        # the honest cm-trajectory effect ~0.96-0.97)
        inter = np.intersect1d(keys_s, keys_r).size
        union = np.union1d(keys_s, keys_r).size
        assert inter / union > 0.95, f"voxel IoU {inter / union}"

    def test_sharded_without_mesh_raises(self):
        cfg = small_cfg(
            map=cfg_mod.MapConfig(capacity=32768, sharded=True))
        with pytest.raises(ValueError, match="map.sharded"):
            pl.LIOPipeline(cfg)

    def test_capacity_divisibility_enforced(self):
        cfg = sharded_cfg(
            map=cfg_mod.MapConfig(capacity=32770, sharded=True),
        )
        with pytest.raises(ValueError, match="capacity"):
            pl.LIOPipeline(cfg)
