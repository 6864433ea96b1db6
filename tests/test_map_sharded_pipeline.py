"""Map-block sharding as a live pipeline operating mode (BASELINE config 5).

The distributed map (parallel/voxmap_sharded) serving the odometry loop end
to end: sharded bootstrap insert, ring-gather candidates, sharded per-frame
insert, and online rebalancing — driven through LIOPipeline on the simulated
8-device CPU mesh.

Parity design (round-3 rework): under candidate_method="topk" the sharded
ring gather composes the EXACT global KNN (per-block exact top-K + union
top-K — each global nearest is among its own block's top-K), identical to
the replicated path's exact search whenever the replicated radius query
does not truncate. The parity tests therefore run topk + float64 (jax x64):
candidate sets are equal by construction and the remaining divergence is
only collective-reduction rounding at ~1e-16, which cannot amplify to
visible drift the way f32's ~1e-7 did (round-2's 0.098 m cross-host
failure). The live bucketed mode is covered by the ground-truth-tracking
tests, which assert ATE against truth (self-stabilizing, host-robust)
rather than path-vs-path drift.

Reference semantics being distributed: VoxelHashMap insert/evict/cap
(ref: svn-icp/src/core/VoxelHashMap.cpp:22-61) applied per key-range block.
"""

import dataclasses

import jax
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


def parity_overrides():
    """Exact-composition f64 operating point (module docstring): topk
    candidates, target capacity = map capacity so the replicated radius
    query can never truncate (truncation would give the replicated path a
    SUBSET of the map the sharded path searches fully)."""
    return dict(
        icp=cfg_mod.SteinICPConfig(
            particle_count=8, iterations=30, lr=1.0, max_dist=2.8,
            knn_count=16, early_stop=True, convergence_threshold=5e-4,
            candidate_method="topk",
            source_capacity=1024, target_capacity=32768,
        ),
        dtype="float64",
    )


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
        """Exact-composition parity (module docstring): identical candidate
        sets by construction, f64 numerics — the sharded-map pipeline must
        reproduce the replicated-map trajectory to collective-rounding
        levels, far below a millimetre."""
        with jax.enable_x64(True):
            cfg_s = sharded_cfg(**parity_overrides())
            pipe_s, gt = run_sequence(cfg_s, world, n_frames=8)
            cfg_r = small_cfg(**parity_overrides())
            pipe_r, _ = run_sequence(cfg_r, world, n_frames=8)
        est_s, est_r = pipe_s.trajectory(), pipe_r.trajectory()
        diff = np.linalg.norm(est_s[:, :3, 3] - est_r[:, :3, 3], axis=1)
        assert diff.max() < 1e-4, f"sharded vs replicated drift {diff.max()}"

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
        unchanged; only the layout is distributed). Under the exact-parity
        operating point the two pipelines' poses agree to ~1e-9 (see
        test_parity_with_replicated_map), so every insert lands in the SAME
        voxel on both paths and the key sets must be identical — not
        approximately overlapping."""
        with jax.enable_x64(True):
            cfg_s = sharded_cfg(**parity_overrides())
            pipe_s, _ = run_sequence(cfg_s, world, n_frames=4)
            cfg_r = small_cfg(**parity_overrides())
            pipe_r, _ = run_sequence(cfg_r, world, n_frames=4)
        from svnicp_tpu.core.pointcloud import INVALID_KEY

        ks = np.asarray(pipe_s.state.vmap.key)
        vs = np.asarray(pipe_s.state.vmap.valid)
        kr = np.asarray(pipe_r.state.vmap.key)
        vr = np.asarray(pipe_r.state.vmap.valid)
        keys_s = np.unique(ks[vs & (ks != INVALID_KEY)])
        keys_r = np.unique(kr[vr & (kr != INVALID_KEY)])
        np.testing.assert_array_equal(keys_s, keys_r)

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

    def test_reanchor_composes_with_sharded_map(self, world):
        """Loop-closure re-anchoring on the DISTRIBUTED map (round-3 verdict
        item: the rigid move re-keys per block and migrates rows over the
        rebalance ring pass). Under the exact-composition f64 operating
        point, applying the same world-frame correction mid-sequence to the
        sharded and replicated pipelines must leave them in parity — both
        immediately and after further frames registered against the moved
        map."""
        import jax.numpy as jnp

        from svnicp_tpu.core import geometry as geo
        from svnicp_tpu.core.pointcloud import INVALID_KEY

        delta_r = np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.0, 0.05])),
                             np.float64)
        delta_t = np.asarray([0.4, -0.25, 0.1], np.float64)

        def run_with_midway_reanchor(cfg):
            times, rots, trans = datasets.synthetic_trajectory(
                8, dt=0.12, speed=1.2, seed=11)
            rng = np.random.default_rng(11)
            pipe = pl.LIOPipeline(cfg)
            for i in range(8):
                scan = world.scan_at(rng, rots[i], trans[i], n_points=1500)
                pipe.feed_scan(float(times[i]), scan)
                if i == 4:
                    pipe.apply_reanchor(delta_r, delta_t)
            return pipe

        with jax.enable_x64(True):
            pipe_s = run_with_midway_reanchor(sharded_cfg(**parity_overrides()))
            pipe_r = run_with_midway_reanchor(small_cfg(**parity_overrides()))
        assert pipe_s.reanchors == 1 and pipe_r.reanchors == 1
        est_s, est_r = pipe_s.trajectory(), pipe_r.trajectory()
        diff = np.linalg.norm(est_s[:, :3, 3] - est_r[:, :3, 3], axis=1)
        assert diff.max() < 1e-4, f"post-reanchor sharded drift {diff.max()}"
        # the moved maps hold identical resident voxel keys
        ks, vs = np.asarray(pipe_s.state.vmap.key), np.asarray(pipe_s.state.vmap.valid)
        kr, vr = np.asarray(pipe_r.state.vmap.key), np.asarray(pipe_r.state.vmap.valid)
        np.testing.assert_array_equal(
            np.unique(ks[vs & (ks != INVALID_KEY)]),
            np.unique(kr[vr & (kr != INVALID_KEY)]))

    def test_reanchor_with_sharded_map_config_accepted(self):
        # round-3 exclusion lifted: the combination now constructs
        cfg = sharded_cfg(
            posegraph=cfg_mod.PoseGraphConfig(enabled=True, reanchor=True))
        pipe = pl.LIOPipeline(cfg)
        assert pipe.cfg.posegraph.reanchor and pipe.cfg.map.sharded


def test_save_particles_on_mesh(world):
    """Sharded save_particles (round 5): the per-iteration particle history
    must be readable from mesh-run FrameOutputs — the config exclusion is
    gone (the sharded align loop records via sharding.run_align_loop)."""
    cfg = sharded_cfg(save_particles=True)
    pipe, _ = run_sequence(cfg, world, n_frames=3)
    out = pipe.outputs[-1]
    hist = np.asarray(out.history)
    assert hist.shape == (cfg.icp.iterations, cfg.icp.particle_count, 6)
    assert np.isfinite(hist).all()
    # the last recorded iteration equals the final particles
    np.testing.assert_allclose(hist[int(out.icp_iterations) - 1],
                               np.asarray(out.particles), atol=1e-5)
