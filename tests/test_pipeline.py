"""End-to-end pipeline tests on synthetic ground-truthed sequences
(SURVEY.md §4 integration strategy: 20-frame corridor vs ground truth)."""

import dataclasses

import numpy as np
import pytest

from svnicp_tpu import config as cfg_mod
from svnicp_tpu.io import datasets, metrics
from svnicp_tpu.runtime import pipeline as pl


def small_cfg(**over):
    base = dict(
        icp=cfg_mod.SteinICPConfig(
            particle_count=8, iterations=30, lr=1.0, max_dist=2.8, knn_count=16,
            early_stop=True, convergence_threshold=5e-4,
            source_capacity=1024, target_capacity=8192,
        ),
        map=cfg_mod.MapConfig(voxel_size=1.0, max_points_per_voxel=10,
                              max_range=120.0, capacity=32768),
        preprocess=cfg_mod.PreprocessConfig(min_range=1.0, max_range=50.0,
                                            voxel_size=1.0, raw_capacity=8192),
        lio=cfg_mod.LIOConfig(estimator="icp", frame_gap_seconds=0.0),
    )
    base.update(over)
    return cfg_mod.PipelineConfig(**base)


@pytest.fixture(scope="module")
def world():
    return datasets.SyntheticWorld(extent=40.0, seed=3)


def run_sequence(cfg, world, n_frames=12, seed=5, with_imu=False):
    times, rots, trans = datasets.synthetic_trajectory(n_frames, dt=0.1, speed=1.2, seed=seed)
    rng = np.random.default_rng(seed)
    pipe = pl.LIOPipeline(cfg)
    if with_imu:
        from svnicp_tpu.core.imu import GRAVITY

        for t, acc, gyro in datasets.synthetic_imu(times, rots, trans, GRAVITY):
            pipe.feed_imu(t, acc, gyro)
    for i in range(n_frames):
        scan = world.scan_at(rng, rots[i], trans[i], n_points=4000, noise=0.01)
        pipe.feed_scan(float(times[i]), scan)
    gt = np.tile(np.eye(4), (n_frames, 1, 1))
    gt[:, :3, :3] = rots
    gt[:, :3, 3] = trans
    return pipe, gt


class TestOdometryICPMode:
    def test_short_sequence_tracks_ground_truth(self, world):
        cfg = small_cfg()
        pipe, gt = run_sequence(cfg, world, n_frames=12)
        est = pipe.trajectory()
        assert est.shape == gt.shape
        ate = metrics.ate_rmse(est, gt, align="first")
        assert ate < 0.12, f"ATE {ate}"
        rpe_t, rpe_r = metrics.rpe(est, gt)
        assert rpe_t < 0.08, f"RPE-t {rpe_t}"
        assert rpe_r < 0.02, f"RPE-r {rpe_r}"

    def test_map_grows_and_outputs_sane(self, world):
        cfg = small_cfg()
        pipe, _ = run_sequence(cfg, world, n_frames=5)
        outs = pipe.outputs
        assert int(outs[0].map_points) > 0
        assert int(outs[-1].map_points) > int(outs[0].map_points)
        for o in outs[1:]:
            assert np.isfinite(np.asarray(o.var_icp)).all()
            assert int(o.icp_iterations) >= 1
            assert np.isfinite(np.asarray(o.particles)).all()

    def test_frame_gap_gating(self, world):
        cfg = small_cfg(lio=cfg_mod.LIOConfig(estimator="icp", frame_gap_seconds=0.15))
        times, rots, trans = datasets.synthetic_trajectory(6, dt=0.1)
        rng = np.random.default_rng(0)
        pipe = pl.LIOPipeline(cfg)
        n_processed = 0
        for i in range(6):
            scan = world.scan_at(rng, rots[i], trans[i], n_points=2000)
            if pipe.feed_scan(float(times[i]), scan) is not None:
                n_processed += 1
        assert n_processed == 3  # every other 0.1s frame passes the 0.15s gate


class TestOdometryKFMode:
    def test_kf_sequence_tracks_ground_truth(self, world):
        cfg = small_cfg(
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
            imu=cfg_mod.IMUNoiseConfig.from_yaml_units(
                [2.0, 2.0, 10.0], [50.0] * 3, [20.0] * 3, [500.0] * 3
            ),
        )
        pipe, gt = run_sequence(cfg, world, n_frames=12, with_imu=True)
        est = pipe.trajectory()
        ate = metrics.ate_rmse(est, gt, align="first")
        assert ate < 0.2, f"KF ATE {ate}"
        # ESKF actually consumed IMU: velocity should be near the true speed
        v = np.asarray(pipe.outputs[-1].velocity)
        assert 0.3 < np.linalg.norm(v) < 3.0

    def test_variance_filters_populated(self, world):
        cfg = small_cfg(
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0,
                                  cov_filter="max_sliding_window"),
        )
        pipe, _ = run_sequence(cfg, world, n_frames=6, with_imu=True)
        last = pipe.outputs[-1]
        assert (np.asarray(last.var_max_sliding) >= np.asarray(last.var_icp) - 1e-12).all()
        assert np.isfinite(np.asarray(last.var_mean)).all()


    def test_init_from_motion_fixes_fullspeed_start(self, world):
        """lio.init_from_motion (round 5): a log that starts MID-MOTION
        (every real recording) must not pay the v=0 cold-start transient.
        The bootstrap adopts the first aligned frame's full ICP pose and
        derives the velocity from it; measured 0.167 -> 0.100 ATE on this
        full-speed sequence (pure ICP: 0.072 — the residual gap is the
        steady-state KF-vs-ICP difference on this world, BASELINE.md
        icp_cov_scales note, not the transient: per-frame error at frames
        1-2 matches ICP mode once the bootstrap fires)."""
        imu = cfg_mod.IMUNoiseConfig.from_yaml_units(
            [2.0, 2.0, 10.0], [50.0] * 3, [20.0] * 3, [500.0] * 3)
        plain = small_cfg(
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
            imu=imu)
        boot = small_cfg(
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0,
                                  init_from_motion=True), imu=imu)
        ates = {}
        vels = {}
        for name, cfg in (("plain", plain), ("boot", boot)):
            pipe, gt = run_sequence(cfg, world, n_frames=14, with_imu=True)
            ates[name] = metrics.ate_rmse(pipe.trajectory(), gt, align="first")
            vels[name] = np.linalg.norm(np.asarray(pipe.outputs[2].velocity))
        assert ates["boot"] < 0.75 * ates["plain"], ates
        # the filter's velocity must be near the true 1.2 m/s within two
        # frames of the bootstrap (plain takes ~10 frames)
        assert vels["boot"] > 0.8, vels
        assert vels["plain"] < 0.5, vels


class TestLongRunStability:
    def test_fifty_frames_no_divergence(self, world):
        cfg = small_cfg()
        pipe, gt = run_sequence(cfg, world, n_frames=50, seed=13)
        est = pipe.trajectory()
        for o in pipe.outputs:
            assert np.isfinite(np.asarray(o.pose_t)).all()
            assert np.isfinite(np.asarray(o.var_icp)).all()
        ate = metrics.ate_rmse(est, gt, align="umeyama")
        assert ate < 0.5, f"50-frame ATE {ate}"
        # capacity pressure must be visible, not silent: when points are
        # dropped the map reports full occupancy and a nonzero drop count
        last = pipe.outputs[-1]
        if int(last.map_dropped) > 0:
            assert int(last.map_points) == cfg.map.capacity

    def test_insert_every_two_still_tracks(self, world):
        cfg = small_cfg(map=cfg_mod.MapConfig(
            voxel_size=1.0, max_points_per_voxel=10, max_range=120.0,
            capacity=32768, insert_every=2))
        pipe, gt = run_sequence(cfg, world, n_frames=12)
        ate = metrics.ate_rmse(pipe.trajectory(), gt, align="first")
        assert ate < 0.2, f"decimated-insert ATE {ate}"
        # off-cadence frames must not touch the map: the dedicated
        # no-insert specialization leaves the point count frozen
        counts = [int(o.map_points) for o in pipe.outputs]
        for i in range(1, len(counts), 2):   # odd device frame_idx = skipped
            assert counts[i] == counts[i - 1], (i, counts)

    def test_insert_cadence_skip_matches_batched(self, world):
        """The host-cadence no-insert specialization (per-frame dispatch)
        and the in-graph frame_idx predicate (the lax.scan batch path) are
        two implementations of the same map.insert_every semantics — their
        trajectories must agree."""
        cfg1 = small_cfg(map=cfg_mod.MapConfig(
            voxel_size=1.0, max_points_per_voxel=10, max_range=120.0,
            capacity=32768, insert_every=3))
        pipe1, _ = run_sequence(cfg1, world, n_frames=8)
        cfg3 = dataclasses.replace(cfg1, dispatch_batch=4)
        pipe3 = pl.LIOPipeline(cfg3)
        times, rots, trans = datasets.synthetic_trajectory(8, dt=0.1, speed=1.2, seed=5)
        rng2 = np.random.default_rng(5)
        for i in range(8):
            scan = world.scan_at(rng2, rots[i], trans[i], n_points=4000, noise=0.01)
            pipe3.feed_scan(float(times[i]), scan)
        pipe3.flush()
        assert len(pipe3.outputs) == len(pipe1.outputs) == 8
        np.testing.assert_allclose(pipe3.trajectory(), pipe1.trajectory(),
                                   rtol=1e-5, atol=1e-5)
        # and the skip pattern itself must match (map point counts agree)
        c1 = [int(o.map_points) for o in pipe1.outputs]
        c3 = [int(o.map_points) for o in pipe3.outputs]
        assert c1 == c3


class TestThreadedIngest:
    def test_batched_dispatch_matches_sequential(self, world):
        """dispatch_batch>1 must produce bit-identical state evolution (the
        same step function runs, just under lax.scan), incl. a partial-batch
        flush()."""
        cfg1 = small_cfg()
        pipe1, gt = run_sequence(cfg1, world, n_frames=7)
        cfg4 = dataclasses.replace(cfg1, dispatch_batch=3)  # 6 frames + 1 rest
        pipe4 = pl.LIOPipeline(cfg4)
        times, rots, trans = datasets.synthetic_trajectory(7, dt=0.1, speed=1.2, seed=5)
        rng2 = np.random.default_rng(5)
        returned = []
        for i in range(7):
            scan = world.scan_at(rng2, rots[i], trans[i], n_points=4000, noise=0.01)
            returned.append(pipe4.feed_scan(float(times[i]), scan))
        pipe4.flush()
        # buffered feeds return None, flushes return the batch tail
        assert returned[1] is None and returned[2] is None
        assert returned[3] is not None
        assert len(pipe4.outputs) == len(pipe1.outputs) == 7
        np.testing.assert_allclose(pipe4.trajectory(), pipe1.trajectory(),
                                   rtol=1e-5, atol=1e-5)

    def test_host_downsample_matches_device_path(self, world):
        """preprocess.host_downsample moves crop+downsample to native C++;
        the selection is bit-compatible so trajectories must match tightly."""
        cfg_dev = small_cfg()
        pipe_dev, _ = run_sequence(cfg_dev, world, n_frames=6)
        cfg_host = dataclasses.replace(
            cfg_dev,
            preprocess=dataclasses.replace(cfg_dev.preprocess, host_downsample=True),
        )
        pipe_host, _ = run_sequence(cfg_host, world, n_frames=6)
        assert len(pipe_host.outputs) == len(pipe_dev.outputs)
        np.testing.assert_allclose(pipe_host.trajectory(), pipe_dev.trajectory(),
                                   rtol=1e-4, atol=1e-4)

    def test_host_downsample_with_batched_dispatch(self, world):
        """host_downsample and dispatch_batch must compose (regression: the
        host path used to bypass the batching logic entirely)."""
        cfg_ref = small_cfg(preprocess=dataclasses.replace(
            small_cfg().preprocess, host_downsample=True))
        pipe_ref, _ = run_sequence(cfg_ref, world, n_frames=7)
        cfg_b = dataclasses.replace(cfg_ref, dispatch_batch=3)
        pipe_b = pl.LIOPipeline(cfg_b)
        times, rots, trans = datasets.synthetic_trajectory(7, dt=0.1, speed=1.2, seed=5)
        rng2 = np.random.default_rng(5)
        rets = []
        for i in range(7):
            scan = world.scan_at(rng2, rots[i], trans[i], n_points=4000, noise=0.01)
            rets.append(pipe_b.feed_scan(float(times[i]), scan))
        pipe_b.flush()
        assert rets[1] is None and rets[3] is not None  # batching engaged
        assert len(pipe_b.outputs) == 7
        np.testing.assert_allclose(pipe_b.trajectory(), pipe_ref.trajectory(),
                                   rtol=1e-5, atol=1e-5)

    def test_stage_ahead_matches_sequential(self, world):
        """cfg.stage_ahead overlaps native staging with dispatch on a worker
        thread; staging is pure and frames dispatch in order, so the
        trajectory must be bit-identical to the synchronous host path."""
        cfg_ref = small_cfg(preprocess=dataclasses.replace(
            small_cfg().preprocess, host_downsample=True))
        pipe_ref, _ = run_sequence(cfg_ref, world, n_frames=7)
        cfg_a = dataclasses.replace(cfg_ref, stage_ahead=True)
        pipe_a = pl.LIOPipeline(cfg_a)
        times, rots, trans = datasets.synthetic_trajectory(7, dt=0.1, speed=1.2, seed=5)
        rng2 = np.random.default_rng(5)
        rets = []
        for i in range(7):
            scan = world.scan_at(rng2, rots[i], trans[i], n_points=4000, noise=0.01)
            rets.append(pipe_a.feed_scan(float(times[i]), scan))
        pipe_a.flush()
        assert rets[0] is not None           # bootstrap stays synchronous
        assert rets[1] is None               # first staged frame: 1-frame latency
        assert rets[2] is not None
        assert len(pipe_a.outputs) == 7
        np.testing.assert_array_equal(pipe_a.trajectory(), pipe_ref.trajectory())

    def test_quantized_upload_tracks_float_path(self, world):
        """preprocess.quantize_upload ships int16 points on a 2^-8 m grid;
        the trajectory must stay within quantization-noise distance of the
        float upload path."""
        cfg_f = small_cfg(preprocess=dataclasses.replace(
            small_cfg().preprocess, host_downsample=True))
        pipe_f, _ = run_sequence(cfg_f, world, n_frames=6)
        cfg_q = dataclasses.replace(
            cfg_f, preprocess=dataclasses.replace(cfg_f.preprocess,
                                                  quantize_upload=True))
        pipe_q, _ = run_sequence(cfg_q, world, n_frames=6)
        d = np.linalg.norm(
            pipe_q.trajectory()[:, :3, 3] - pipe_f.trajectory()[:, :3, 3],
            axis=1)
        assert d.max() < 0.03, d

    def test_quantized_raw_upload_tracks_float_path(self, world):
        """quantize_upload on the RAW path (round 5 — the segmentation/
        feature operating points ship the raw padded scan): int16 2^-8 m
        grid, trajectory within quantization-noise distance of float."""
        cfg_f = small_cfg()       # raw path (host_downsample off)
        pipe_f, _ = run_sequence(cfg_f, world, n_frames=6)
        cfg_q = dataclasses.replace(
            cfg_f, preprocess=dataclasses.replace(cfg_f.preprocess,
                                                  quantize_upload=True))
        pipe_q, _ = run_sequence(cfg_q, world, n_frames=6)
        d = np.linalg.norm(
            pipe_q.trajectory()[:, :3, 3] - pipe_f.trajectory()[:, :3, 3],
            axis=1)
        assert d.max() < 0.03, d

    def test_stage_ahead_mode_switch_preserves_order(self, world):
        """Frames that can't use the fast path (here: per-point timestamps)
        must drain the staged-ahead queue first so dispatch order is kept."""
        cfg = small_cfg(preprocess=dataclasses.replace(
            small_cfg().preprocess, host_downsample=True))
        cfg = dataclasses.replace(cfg, stage_ahead=True)
        pipe = pl.LIOPipeline(cfg)
        times, rots, trans = datasets.synthetic_trajectory(6, dt=0.1, speed=1.2, seed=5)
        rng2 = np.random.default_rng(5)
        for i in range(6):
            scan = world.scan_at(rng2, rots[i], trans[i], n_points=4000, noise=0.01)
            ts = (np.linspace(0, 1, len(scan), dtype=np.float32)
                  if i == 3 else None)   # frame 3 forces the raw path
            pipe.feed_scan(float(times[i]), scan, timestamps=ts)
        pipe.flush()
        assert len(pipe.outputs) == 6
        assert pipe.times == [float(t) for t in times[:6]]
        traj = pipe.trajectory()
        assert np.isfinite(traj).all()

    def test_stage_ahead_excluded_with_posegraph(self, world):
        """The pose graph needs per-frame host decisions on the CURRENT
        frame; stage_ahead must be ignored so keyframes still appear."""
        cfg = small_cfg(
            preprocess=dataclasses.replace(small_cfg().preprocess,
                                           host_downsample=True),
            posegraph=cfg_mod.PoseGraphConfig(
                enabled=True, keyframe_trans_threshold=0.05),
        )
        cfg = dataclasses.replace(cfg, stage_ahead=True)
        pipe, _ = run_sequence(cfg, world, n_frames=6)
        assert len(pipe.outputs) == 6
        assert len(pipe.posegraph.nodes_r) >= 2   # keyframes were added

    def test_quantize_upload_range_validation(self):
        with pytest.raises(ValueError, match="quantize_upload"):
            cfg_mod.PreprocessConfig(max_range=150.0, quantize_upload=True)

    def test_run_threaded_matches_sequential(self, world, rng):
        cfg = small_cfg()
        times, rots, trans = datasets.synthetic_trajectory(6, dt=0.1, seed=9)
        scans = [world.scan_at(np.random.default_rng(50 + i), rots[i], trans[i],
                               n_points=2000) for i in range(6)]
        pipe_seq = pl.LIOPipeline(cfg)
        for i in range(6):
            pipe_seq.feed_scan(float(times[i]), scans[i])
        pipe_thr = pl.LIOPipeline(cfg)
        n = pipe_thr.run_threaded((float(times[i]), scans[i]) for i in range(6))
        assert n == 6
        np.testing.assert_allclose(
            np.asarray(pipe_thr.outputs[-1].pose_t),
            np.asarray(pipe_seq.outputs[-1].pose_t), atol=1e-5)


class TestConfigVariants:
    def test_svgd_method_pipeline(self, world):
        cfg = small_cfg(icp=cfg_mod.SteinICPConfig(
            method="svgd", particle_count=8, iterations=60, lr=0.03, max_dist=1.0,
            knn_count=16, optimizer="adam", source_capacity=1024,
            target_capacity=8192))
        pipe, gt = run_sequence(cfg, world, n_frames=8)
        est = pipe.trajectory()
        ate = metrics.ate_rmse(est, gt, align="first")
        assert ate < 0.4, f"SVGD pipeline ATE {ate}"

    def test_const_cov_and_mean_filter_paths(self, world):
        for over in (
            cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0,
                              use_const_cov=True, const_cov=(1e-4, 1e-5)),
            cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0,
                              cov_filter="mean"),
        ):
            cfg = small_cfg(lio=over)
            pipe, _ = run_sequence(cfg, world, n_frames=5, with_imu=True)
            assert np.isfinite(np.asarray(pipe.outputs[-1].pose_t)).all()


class TestExtrinsics:
    def test_extrinsic_compensation_applied(self, world, rng):
        """Scans given in a rotated/offset lidar frame must produce the same
        trajectory once the extrinsic is configured (ref ingest transform,
        OdometryPipeline.cpp:349)."""
        from scipy.spatial.transform import Rotation as sr

        r_ext = sr.from_euler("z", 10, degrees=True).as_matrix().astype(np.float32)
        t_ext = np.array([0.1, -0.2, 0.3], np.float32)
        cfg_plain = small_cfg()
        cfg_ext = small_cfg(lio=cfg_mod.LIOConfig(
            estimator="icp", frame_gap_seconds=0.0,
            extrinsic_R=tuple(r_ext.reshape(-1).tolist()),
            extrinsic_t=tuple(t_ext.tolist())))

        times, rots, trans = datasets.synthetic_trajectory(6, dt=0.1, seed=9)
        scans = [world.scan_at(np.random.default_rng(100 + i), rots[i], trans[i],
                               n_points=3000) for i in range(6)]
        pipe_a = pl.LIOPipeline(cfg_plain)
        pipe_b = pl.LIOPipeline(cfg_ext)
        rinv = np.linalg.inv(r_ext)
        for i in range(6):
            pipe_a.feed_scan(float(times[i]), scans[i])
            # present the same scan in the "lidar" frame: p_l = R^-1 (p_imu - t)
            lidar_frame = (scans[i] - t_ext) @ rinv.T
            pipe_b.feed_scan(float(times[i]), lidar_frame.astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(pipe_b.outputs[-1].pose_t),
            np.asarray(pipe_a.outputs[-1].pose_t), atol=2e-2)


class TestMetrics:
    def test_ate_zero_for_identical(self):
        poses = np.tile(np.eye(4), (10, 1, 1))
        poses[:, 0, 3] = np.arange(10)
        assert metrics.ate_rmse(poses, poses) < 1e-9
        assert metrics.rpe(poses, poses)[0] < 1e-9

    def test_umeyama_recovers_offset(self, rng):
        gt = rng.normal(size=(20, 3))
        r, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(r) < 0:
            r[:, 0] *= -1
        est = gt @ r.T + np.array([5.0, -3.0, 2.0])
        assert metrics.ate_rmse(est, gt, align="umeyama") < 1e-6


class TestSegmentationInPipeline:
    def test_segmentation_path_runs_and_tracks(self, rng):
        # scans synthesized on an HDL-like pattern so the range image fills;
        # verifies the use_segmentation config path end to end
        cfg = small_cfg(preprocess=cfg_mod.PreprocessConfig(
            min_range=1.0, max_range=50.0, raw_capacity=8192,
            use_segmentation=True, sensor_model="vlp16"))
        world = datasets.SyntheticWorld(extent=40.0, seed=3)
        times, rots, trans = datasets.synthetic_trajectory(6, dt=0.1, seed=5)
        pipe = pl.LIOPipeline(cfg)
        for i in range(6):
            out = pipe.feed_scan(float(times[i]),
                                 world.scan_at(rng, rots[i], trans[i], n_points=4000))
        assert np.isfinite(np.asarray(out.pose_t)).all()
        assert int(out.map_points) > 0


class TestKittiCLI:
    def test_kitti_cli_end_to_end(self, rng, tmp_path, capsys):
        """`cli kitti` over a synthesized mini KITTI directory: velodyne
        .bin files + times.txt + poses — the full dataset-runner surface."""
        import json

        from svnicp_tpu import cli

        world = datasets.SyntheticWorld(extent=30.0, seed=3)
        times, rots, trans = datasets.synthetic_trajectory(5, dt=0.1, seed=5)
        vel = tmp_path / "velodyne"
        vel.mkdir()
        for i in range(5):
            pts = world.scan_at(rng, rots[i], trans[i], n_points=3000)
            rec = np.zeros((len(pts), 4), np.float32)
            rec[:, :3] = pts
            rec.tofile(vel / f"{i:06d}.bin")
        (tmp_path / "times.txt").write_text(
            "".join(f"{t:.6f}\n" for t in times[:5]))
        poses = np.concatenate(
            [rots.reshape(5, 3, 3), trans[:, :, None]], axis=2
        ).reshape(5, 12)
        pose_file = tmp_path / "poses.txt"
        np.savetxt(pose_file, poses)

        cfg_file = tmp_path / "cfg.yaml"
        cfg_file.write_text(
            "icp:\n  particle_count: 4\n  iterations: 8\n  knn_count: 8\n"
            "  source_capacity: 512\n  target_capacity: 2048\n"
            "map:\n  capacity: 8192\n  max_points_per_voxel: 5\n"
            "preprocess:\n  min_range: 0.5\n  max_range: 40.0\n"
            "  raw_capacity: 4096\n  host_downsample: true\n"
            "  quantize_upload: true\n"
            "lio:\n  estimator: icp\n  frame_gap_seconds: 0.0\n"
            # stage_ahead: the CLI must flush the staged tail — all 5 frames
            # land in the summary with their own stamps
            "stage_ahead: true\n")
        cli.main(["kitti", "--velodyne", str(vel),
                  "--times", str(tmp_path / "times.txt"),
                  "--poses", str(pose_file), "--config", str(cfg_file),
                  "--output", str(tmp_path / "records.jsonl")])
        line = capsys.readouterr().out.strip().splitlines()[-1]
        stats = json.loads(line)
        assert stats["frames"] == 5
        assert np.isfinite(stats["ate_rmse_m"]) and stats["ate_rmse_m"] < 5.0
        assert (tmp_path / "records.jsonl").stat().st_size > 0


class TestDegenerateFrames:
    def test_empty_scan_mid_sequence_contained(self, world):
        """A scan with zero in-range points must not corrupt the filter or
        the map: alignment falls back to the prediction (align_ok False or
        an identity correction) and later frames keep tracking."""
        cfg = small_cfg()
        times, rots, trans = datasets.synthetic_trajectory(8, dt=0.1, speed=1.2, seed=5)
        rng2 = np.random.default_rng(5)
        pipe = pl.LIOPipeline(cfg)
        for i in range(8):
            if i == 3:
                scan = np.full((100, 3), 1e6, np.float32)   # all cropped out
            else:
                scan = world.scan_at(rng2, rots[i], trans[i], n_points=4000,
                                     noise=0.01)
            out = pipe.feed_scan(float(times[i]), scan)
            assert np.isfinite(np.asarray(out.pose_t)).all()
        gt = np.tile(np.eye(4), (8, 1, 1))
        gt[:, :3, :3] = rots
        gt[:, :3, 3] = trans
        # drop the empty frame from the comparison; the rest must track
        # (first-pose aligned — the trajectory doesn't start at the origin)
        keep = [i for i in range(8) if i != 3]
        est = pipe.trajectory()[keep]
        rel_est = est[:, :3, 3] - est[0, :3, 3]
        rel_gt = gt[keep][:, :3, 3] - gt[keep][0, :3, 3]
        err = np.linalg.norm(rel_est - rel_gt, axis=1)
        assert err[-1] < 0.5, err
        assert not bool(pipe.outputs[3].align_ok)   # empty frame contained

    def test_empty_scan_with_host_downsample(self, world):
        """Same containment on the native host-staging fast path."""
        cfg = small_cfg(preprocess=dataclasses.replace(
            small_cfg().preprocess, host_downsample=True))
        cfg = dataclasses.replace(cfg, stage_ahead=True)
        times, rots, trans = datasets.synthetic_trajectory(6, dt=0.1, speed=1.2, seed=5)
        rng2 = np.random.default_rng(5)
        pipe = pl.LIOPipeline(cfg)
        for i in range(6):
            scan = (np.full((100, 3), 1e6, np.float32) if i == 2 else
                    world.scan_at(rng2, rots[i], trans[i], n_points=4000))
            pipe.feed_scan(float(times[i]), scan)
        pipe.flush()
        assert len(pipe.outputs) == 6
        for o in pipe.outputs:
            p = np.asarray(o.pose_t)
            assert np.isfinite(p).all() and np.linalg.norm(p) < 100.0, p
        assert not bool(pipe.outputs[2].align_ok)   # empty frame contained

    def test_kf_mode_on_host_downsample_fast_path(self, world):
        """KF estimator composed with host_downsample + stage_ahead: the
        IMU window packs on the main thread, so ordering must hold and the
        filter must keep tracking."""
        cfg = small_cfg(
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
            imu=cfg_mod.IMUNoiseConfig.from_yaml_units(
                [2.0, 2.0, 10.0], [50.0] * 3, [20.0] * 3, [500.0] * 3),
            preprocess=dataclasses.replace(small_cfg().preprocess,
                                           host_downsample=True),
        )
        cfg = dataclasses.replace(cfg, stage_ahead=True)
        pipe, gt = run_sequence(cfg, world, n_frames=10, with_imu=True)
        pipe.flush()
        est = pipe.trajectory()
        assert len(est) == 10
        ate = metrics.ate_rmse(est, gt, align="first")
        assert ate < 0.25, f"KF fast-path ATE {ate}"


class TestCovarianceCalibration:
    def test_nees_metric_identity(self):
        """NEES of a perfectly known error against its own covariance."""
        rng = np.random.default_rng(0)
        n = 200
        gt = np.tile(np.eye(4), (n, 1, 1))
        guess = gt.copy()
        cov = np.tile(np.diag([0.04, 0.04, 0.04, 0.001, 0.001, 0.001]), (n, 1, 1))
        est = gt.copy()
        # draw errors FROM the stated covariance: mean NEES must be ~6
        errs = rng.normal(size=(n, 6)) * np.sqrt(np.diag(cov[0]))
        for i in range(n):
            est[i, :3, 3] = errs[i, :3]
            a = errs[i, 3:]
            ang = np.linalg.norm(a)
            if ang > 1e-12:
                k = a / ang
                kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                               [-k[1], k[0], 0]])
                est[i, :3, :3] = (np.eye(3) + np.sin(ang) * kx
                                  + (1 - np.cos(ang)) * kx @ kx)
        mean_nees, vals = metrics.nees(est, gt, guess, cov)
        assert len(vals) == n
        assert 4.5 < mean_nees < 7.5, mean_nees

    def test_pipeline_covariance_positive_definite_and_measurable(self, world):
        """The particle covariance must be usable as a measurement
        covariance: positive-definite every frame, and the NEES calibration
        metric must produce finite values on the synthetic sequence.

        Measured calibration (BASELINE.md): mean NEES ~0.5 for the plane
        flagship (slightly conservative) and ~90 for the grad-norm-converged
        point-to-point path (overconfident — why the reference provides
        `icp_cov_scales` and the mean / max-sliding-window filters,
        OdometryPipeline.cpp:747-762; reproduced as lio.icp_cov_scales and
        lio.cov_filter)."""
        cfg = small_cfg()
        pipe, gt = run_sequence(cfg, world, n_frames=12)
        n = len(pipe.outputs)
        est = pipe.trajectory()
        guess = np.tile(np.eye(4), (n, 1, 1))
        covs = np.zeros((n, 6, 6))
        for i, o in enumerate(pipe.outputs):
            guess[i, :3, :3] = np.asarray(o.guess_r)
            guess[i, :3, 3] = np.asarray(o.guess_t)
            covs[i] = np.asarray(o.cov)
            if i > 0:
                ev = np.linalg.eigvalsh(covs[i])
                assert (ev > 0).all(), (i, ev)
        mean_nees, vals = metrics.nees(est[1:], gt[1:], guess[1:], covs[1:])
        assert len(vals) == n - 1
        assert np.isfinite(mean_nees) and mean_nees > 0


class TestFastPathDeskew:
    def _sweep_sequence(self, world, cfg, n_frames=8):
        times, rots, trans = datasets.synthetic_trajectory(
            n_frames + 1, dt=0.1, speed=2.5, seed=5)
        rng2 = np.random.default_rng(5)
        pipe = pl.LIOPipeline(cfg)
        gts = []
        for i in range(n_frames):
            pts, tau, (mid_r, mid_t) = world.scan_sweep(
                rng2, rots[i], trans[i], rots[i + 1], trans[i + 1],
                n_points=4000, noise=0.01)
            pipe.feed_scan(float(times[i]), pts, timestamps=tau)
            g = np.eye(4)
            g[:3, :3], g[:3, 3] = mid_r, mid_t
            gts.append(g)
        pipe.flush()
        return pipe, np.stack(gts)

    def test_device_deskew_on_fast_path(self, world):
        """preprocess.deskew + per-point timestamps on the host_downsample
        fast path: the downsampled cloud is deskewed ON DEVICE. Must track
        the mid-sweep ground truth about as well as the raw (slow) deskew
        path, and clearly better than ignoring the distortion."""
        base = small_cfg(preprocess=dataclasses.replace(
            small_cfg().preprocess, deskew=True, host_downsample=True,
            quantize_upload=True))   # ts rides the quantized 4th channel
        base = dataclasses.replace(base, stage_ahead=True)
        pipe_fast, gt = self._sweep_sequence(world, base)
        assert len(pipe_fast.outputs) == len(gt)
        ate_fast = metrics.ate_rmse(pipe_fast.trajectory(), gt, align="first")

        slow = dataclasses.replace(base, stage_ahead=False,
                                   preprocess=dataclasses.replace(
                                       base.preprocess, host_downsample=False))
        pipe_slow, _ = self._sweep_sequence(world, slow)
        ate_slow = metrics.ate_rmse(pipe_slow.trajectory(), gt, align="first")

        no_dsk = dataclasses.replace(base, preprocess=dataclasses.replace(
            base.preprocess, deskew=False))
        pipe_raw, _ = self._sweep_sequence(world, no_dsk)
        ate_raw = metrics.ate_rmse(pipe_raw.trajectory(), gt, align="first")

        assert ate_fast < 0.15, (ate_fast, ate_slow, ate_raw)
        assert ate_fast < 1.5 * ate_slow + 0.02, (ate_fast, ate_slow)
        assert ate_fast < ate_raw, (ate_fast, ate_raw)


class TestPackedFrameOutput:
    def test_pack_roundtrip_every_field(self, rng):
        """HostFrameOutput must serve every FrameOutput field bit-exactly
        from the two fused buffers (the packing exists because ~19 tiny
        output buffers cost ~2.2 ms/frame of fixed per-buffer copy overhead
        on the tunnel backend — BASELINE.md round 4)."""
        import jax.numpy as jnp

        p, h = 8, 3
        vals = {}
        for name, shape in pl._PACK_F32:
            vals[name] = jnp.asarray(
                rng.normal(size=shape or ()).astype(np.float32))
        for i, name in enumerate(pl._PACK_I32):
            if name == "align_ok":
                vals[name] = jnp.asarray(True)
            else:
                vals[name] = jnp.asarray(10 + i, jnp.int32)
        out = pl.FrameOutput(
            particles=jnp.asarray(rng.normal(size=(p, 6)).astype(np.float32)),
            weights=jnp.full((p,), 1.0 / p, jnp.float32),
            history=jnp.zeros((h, p, 6), jnp.float32),
            **vals)
        packed = pl.pack_output(out)
        assert packed.small.shape == (pl._PACK_F32_LEN,)
        host = pl.HostFrameOutput(packed)
        for name, shape in pl._PACK_F32:
            got = np.asarray(getattr(host, name))
            np.testing.assert_array_equal(got, np.asarray(getattr(out, name)),
                                          err_msg=name)
            assert got.shape == tuple(shape), name
        for name in pl._PACK_I32:
            want = getattr(out, name)
            got = getattr(host, name)
            if name == "align_ok":
                assert got is True
            else:
                assert int(got) == int(want), name
        np.testing.assert_array_equal(np.asarray(host.particles),
                                      np.asarray(out.particles))
        assert host.history.shape == (h, p, 6)
        with pytest.raises(AttributeError):
            host.not_a_field
