"""Checkpoint/resume + pipeline-integrated pose graph + profiling tests."""

import dataclasses

import jax
import numpy as np
import pytest

from svnicp_tpu import config as cfg_mod
from svnicp_tpu.io import datasets
from svnicp_tpu.runtime import checkpoint, pipeline as pl, profiling


def small_cfg(**over):
    base = dict(
        icp=cfg_mod.SteinICPConfig(particle_count=8, iterations=25, knn_count=16,
                                   max_dist=2.8, source_capacity=1024,
                                   target_capacity=8192),
        map=cfg_mod.MapConfig(voxel_size=1.0, max_points_per_voxel=10,
                              max_range=120.0, capacity=32768),
        preprocess=cfg_mod.PreprocessConfig(min_range=1.0, max_range=50.0,
                                            raw_capacity=8192),
        lio=cfg_mod.LIOConfig(estimator="icp", frame_gap_seconds=0.0),
    )
    base.update(over)
    return cfg_mod.PipelineConfig(**base)


class TestCheckpoint:
    def test_save_load_roundtrip_continues_identically(self, tmp_path, rng):
        world = datasets.SyntheticWorld(extent=40.0, seed=3)
        times, rots, trans = datasets.synthetic_trajectory(8, dt=0.1, seed=5)
        scans = [world.scan_at(rng, rots[i], trans[i], n_points=3000) for i in range(8)]
        cfg = small_cfg()
        pipe = pl.LIOPipeline(cfg)
        for i in range(4):
            pipe.feed_scan(float(times[i]), scans[i])
        ckpt = str(tmp_path / "state.npz")
        checkpoint.save_pipeline(ckpt, pipe)
        # continue original
        for i in range(4, 8):
            pipe.feed_scan(float(times[i]), scans[i])
        # resume into a fresh pipeline
        pipe2 = pl.LIOPipeline(cfg)
        checkpoint.load_pipeline(ckpt, pipe2)
        for i in range(4, 8):
            pipe2.feed_scan(float(times[i]), scans[i])
        np.testing.assert_allclose(
            np.asarray(pipe.outputs[-1].pose_t), np.asarray(pipe2.outputs[-1].pose_t),
            atol=1e-5,
        )

    def test_posegraph_state_roundtrips(self, tmp_path, rng):
        world = datasets.SyntheticWorld(extent=40.0, seed=3)
        cfg = small_cfg(posegraph=cfg_mod.PoseGraphConfig(
            enabled=True, keyframe_trans_threshold=0.1, loop_min_separation=100))
        times, rots, trans = datasets.synthetic_trajectory(6, dt=0.1, speed=3.0, seed=5)
        pipe = pl.LIOPipeline(cfg)
        for i in range(6):
            pipe.feed_scan(float(times[i]),
                           world.scan_at(rng, rots[i], trans[i], n_points=2000))
        n_kf = len(pipe.posegraph.nodes_r)
        n_edges = len(pipe.posegraph.edges)
        assert n_kf >= 2
        ckpt = str(tmp_path / "pg.npz")
        checkpoint.save_pipeline(ckpt, pipe)
        pipe2 = pl.LIOPipeline(cfg)
        checkpoint.load_pipeline(ckpt, pipe2)
        assert len(pipe2.posegraph.nodes_r) == n_kf
        assert len(pipe2.posegraph.edges) == n_edges
        assert len(pipe2._keyframe_clouds) == n_kf
        np.testing.assert_allclose(pipe2.posegraph.nodes_t[-1],
                                   pipe.posegraph.nodes_t[-1])

    def test_shape_mismatch_raises(self, tmp_path, rng):
        cfg = small_cfg()
        pipe = pl.LIOPipeline(cfg)
        ckpt = str(tmp_path / "s.npz")
        checkpoint.save_pipeline(ckpt, pipe)
        cfg2 = small_cfg(map=cfg_mod.MapConfig(capacity=16384, max_range=120.0))
        pipe2 = pl.LIOPipeline(cfg2)
        with pytest.raises(ValueError, match="checkpoint leaf"):
            checkpoint.load_pipeline(ckpt, pipe2)


class TestPoseGraphIntegration:
    def test_keyframes_and_optimized_trajectory(self, rng):
        world = datasets.SyntheticWorld(extent=40.0, seed=3)
        times, rots, trans = datasets.synthetic_trajectory(
            10, dt=0.1, speed=3.0, seed=5)
        cfg = small_cfg(
            posegraph=cfg_mod.PoseGraphConfig(
                enabled=True, keyframe_trans_threshold=0.4,
                keyframe_rot_threshold=10.0, loop_min_separation=100),
        )
        pipe = pl.LIOPipeline(cfg)
        for i in range(10):
            pipe.feed_scan(float(times[i]),
                           world.scan_at(rng, rots[i], trans[i], n_points=3000))
        kf = pipe.optimized_trajectory()
        assert 2 <= len(kf) <= 10
        # keyframes are spaced by at least the translation threshold
        d = np.linalg.norm(np.diff(kf[:, :3, 3], axis=0), axis=1)
        assert (d > 0.3).all()

    def test_loop_closure_verification_path(self, rng):
        # out-and-back path (identity orientation): late keyframes revisit
        # early positions without the per-frame rotation a tight circle would
        # demand of the odometry
        world = datasets.SyntheticWorld(extent=30.0, seed=4)
        xs = np.concatenate([np.linspace(0, 3.2, 9), np.linspace(2.8, -0.2, 9)])
        n = len(xs)
        trans = np.stack([xs, np.full(n, 0.15), np.full(n, 0.8)], 1)
        trans[9:, 1] = -0.15  # slight lateral offset on the way back
        rots = np.tile(np.eye(3), (n, 1, 1))
        cfg = small_cfg(
            posegraph=cfg_mod.PoseGraphConfig(
                enabled=True, keyframe_trans_threshold=0.3,
                keyframe_rot_threshold=10.0, loop_radius=1.0,
                loop_min_separation=8, loop_max_grad=0.05),
        )
        pipe = pl.LIOPipeline(cfg)
        for i in range(n):
            pipe.feed_scan(float(i) * 0.1,
                           world.scan_at(rng, rots[i], trans[i], n_points=3000))
        assert len(pipe.posegraph.nodes_r) >= 10
        # the return pass closes loops against the outbound keyframes
        assert len(pipe.loop_closures) >= 1
        kf = pipe.optimized_trajectory()
        assert np.isfinite(kf).all()


class TestReanchor:
    """Loop-closure reanchoring must demonstrably reduce live drift.

    Scenario design (round-3 rework; the round-2 out-and-back version
    compared 0.068 vs 0.066 m): scan-to-map LIO against a persistent map is
    SELF-localizing on a straight out-and-back — returning scans re-register
    against the start-region map and absorb the drift, so there was nothing
    for the closure to correct (and reanchoring an ill-conditioned graph
    actively hurt). Here the vehicle drives a CIRCLE through fresh territory
    with the scan range capped below the circle diameter: every region is
    mapped once, the registration never sees a global anchor, and heading
    error compounds into real accumulated drift by the time the start
    region comes back into view. The keyframe-to-keyframe loop registration
    (whose target is ONLY the old cloud, so the drifted recent map cannot
    capture it) then recovers the true relative pose, and reanchor feeds the
    correction into the live pose/map/filter.

    Host-independence: runs at dtype float64 (jax x64) — per-host XLA:CPU
    codegen noise (~1e-16) cannot amplify to visible trajectory differences
    the way f32's ~1e-7 does through the chaotic align loop, so identical
    seeds give the same drift numbers on any machine and the margin below
    is real, not machine-calibrated."""

    N_CLOSE = 60          # frames for one full circle
    N_EXTRA = 4           # frames past closure (the live estimate under test)
    RADIUS = 6.0          # measured at f64: odometry-only 0.712 m final
                          # drift, reanchored 0.153 m — 4.7x (the 2x
                          # assertion below carries 2.3x margin)

    def _circle(self):
        n = self.N_CLOSE + self.N_EXTRA
        theta = np.arange(n) * (2 * np.pi / self.N_CLOSE)
        center = np.array([0.0, self.RADIUS, 0.8])
        trans = center[None] + self.RADIUS * np.stack(
            [np.sin(theta), -np.cos(theta), np.zeros(n)], 1)
        rots = np.zeros((n, 3, 3))
        c, s = np.cos(theta), np.sin(theta)
        for i in range(n):
            rots[i] = [[c[i], -s[i], 0], [s[i], c[i], 0], [0, 0, 1]]
        return trans, rots

    def _run(self, rng_seed, reanchor: bool, enabled: bool = True):
        world = datasets.SyntheticWorld(extent=14.0, n_walls=20, n_boxes=14,
                                        seed=4)
        trans, rots = self._circle()
        # sloppy odometry (few iterations, noisy scans) + scans capped at
        # 9 m (< the 12 m circle diameter) so heading error compounds into
        # accumulated drift instead of being absorbed by re-registration
        cfg = small_cfg(
            icp=cfg_mod.SteinICPConfig(
                particle_count=8, iterations=4, knn_count=16, max_dist=2.8,
                early_stop=False, source_capacity=1024, target_capacity=8192),
            preprocess=cfg_mod.PreprocessConfig(min_range=1.0, max_range=9.0,
                                                raw_capacity=8192),
            posegraph=cfg_mod.PoseGraphConfig(
                enabled=enabled, keyframe_trans_threshold=0.3,
                keyframe_rot_threshold=10.0, loop_radius=2.5,
                loop_min_separation=20, loop_max_grad=0.05,
                loop_particles=8, loop_iterations=40, reanchor=reanchor),
            dtype="float64",
        )
        rng = np.random.default_rng(rng_seed)
        with jax.enable_x64(True):
            pipe = pl.LIOPipeline(cfg)
            for i in range(len(trans)):
                pipe.feed_scan(float(i) * 0.1,
                               world.scan_at(rng, rots[i], trans[i],
                                             n_points=2500, max_range=9.0,
                                             noise=0.05))
        end_err = np.linalg.norm(
            np.asarray(pipe.outputs[-1].pose_t) - (trans[-1] - trans[0]))
        return pipe, end_err

    def test_reanchor_corrects_live_estimate(self):
        pipe_ra, err_ra = self._run(9, reanchor=True)
        pipe_odo, err_odo = self._run(9, reanchor=False, enabled=False)
        assert len(pipe_ra.loop_closures) >= 1
        assert pipe_ra.reanchors >= 1
        # the loop closure changed the LIVE estimate and reduced the final
        # drift of an identically-seeded odometry-only run by >= 2x
        assert err_ra < 0.5 * err_odo, (err_ra, err_odo)
        # map and filter state moved coherently: later frames keep aligning
        assert all(bool(o.align_ok) for o in pipe_ra.outputs[1:])

    def test_loop_config_plumbed(self):
        """PosegraphConfig loop hyperparameters reach the verification
        registration (previously hardcoded)."""
        pipe, _ = self._run(9, reanchor=False)
        assert len(pipe.loop_closures) >= 1
        assert pipe.reanchors == 0


def test_stage_timer():
    t = profiling.StageTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a=" in t.report()


class TestReanchorGuards:
    def test_non_finite_delta_rejected(self):
        """A non-finite loop correction must never touch the live state:
        when odometry is fully lost, spurious loop registrations can
        converge in a wrong basin and the optimized graph can go
        non-finite — applying that through the rigid map move would destroy
        the one state that could still recover (observed on a hard
        proxy-loop scenario before this guard)."""
        cfg = small_cfg()
        pipe = pl.LIOPipeline(cfg)
        before = jax.tree.map(np.asarray, pipe.state.vmap)
        pipe.apply_reanchor(np.full((3, 3), np.nan), np.zeros(3))
        pipe.apply_reanchor(np.eye(3), np.array([np.inf, 0.0, 0.0]))
        assert pipe.reanchors == 0
        assert pipe.reanchors_rejected == 2
        np.testing.assert_array_equal(np.asarray(pipe.state.vmap.key),
                                      before.key)

    def test_oversized_correction_rejected(self):
        cfg = small_cfg(posegraph=cfg_mod.PoseGraphConfig(
            max_reanchor_correction=2.0))
        pipe = pl.LIOPipeline(cfg)
        pipe.apply_reanchor(np.eye(3), np.array([5.0, 0.0, 0.0]))
        assert pipe.reanchors == 0 and pipe.reanchors_rejected == 1
        pipe.apply_reanchor(np.eye(3), np.array([0.5, 0.0, 0.0]))
        assert pipe.reanchors == 1
