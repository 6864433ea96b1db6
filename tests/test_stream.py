"""Recorded-stream ingestion (io/stream.py): wire-format roundtrip,
PointCloud2-style interleaved-record parsing, and pipeline playback parity.

The reference consumes live `sensor_msgs/PointCloud2` + `sensor_msgs/Imu`
via ROS subscribers (ref: OdometryPipeline.cpp:307-354); the SVNL log is
the offline equivalent, so the tests pin (a) that arbitrary point strides /
field offsets / time dtypes parse exactly, and (b) that playing a log
through LIOPipeline equals feeding the same data directly.
"""

import io

import numpy as np
import pytest

from svnicp_tpu.io import stream as sm


def _roundtrip(write_fn):
    buf = io.BytesIO()
    w = sm.StreamWriter(buf)
    write_fn(w)
    buf.seek(0)
    return list(sm.StreamReader(buf))


class TestWireFormat:
    def test_imu_roundtrip(self):
        pkts = _roundtrip(lambda w: w.write_imu(1.25, [0.1, 0.2, 9.8],
                                                [0.01, -0.02, 0.03]))
        (p,) = pkts
        assert isinstance(p, sm.ImuPacket)
        assert p.stamp == 1.25
        np.testing.assert_allclose(p.acc, [0.1, 0.2, 9.8], rtol=1e-6)
        np.testing.assert_allclose(p.gyro, [0.01, -0.02, 0.03], rtol=1e-6)

    def test_cloud_tight_roundtrip(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        (p,) = _roundtrip(lambda w: w.write_cloud_xyz(2.0, pts))
        assert isinstance(p, sm.CloudPacket)
        np.testing.assert_array_equal(p.points, pts)
        assert p.timestamps is None

    def test_cloud_time_field_roundtrip(self, rng):
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        ts = rng.uniform(0, 1, 64).astype(np.float32)
        (p,) = _roundtrip(lambda w: w.write_cloud_xyz(2.0, pts, ts))
        np.testing.assert_array_equal(p.points, pts)
        # extract_timestamps re-normalizes to [0,1] over the actual range
        expect = (ts - ts.min()) / (ts.max() - ts.min())
        np.testing.assert_allclose(p.timestamps, expect, atol=1e-6)

    def test_interleaved_records_with_padding_and_f8_time(self, rng):
        """A PointCloud2-shaped buffer: 32-byte records, xyz NOT at offset
        0, f64 time field, junk bytes elsewhere — the parser must read only
        the declared offsets (ref reads field offsets the same way)."""
        n, step = 50, 32
        raw = rng.integers(0, 255, size=(n, step), dtype=np.uint8)
        pts = rng.normal(size=(n, 3)).astype("<f4")
        t_abs = (1e9 + rng.uniform(0, 0.1, n)).astype("<f8")  # absolute stamps
        for c, off in ((0, 4), (1, 8), (2, 12)):
            raw[:, off:off + 4] = np.ascontiguousarray(
                pts[:, c]).view(np.uint8).reshape(n, 4)
        raw[:, 20:28] = np.ascontiguousarray(t_abs).view(np.uint8).reshape(n, 8)
        buf = io.BytesIO()
        w = sm.StreamWriter(buf)
        w.write_cloud(3.5, raw, n, step, off_xyz=(4, 8, 12),
                      off_time=20, time_dtype="f8")
        buf.seek(0)
        (p,) = list(sm.StreamReader(buf))
        np.testing.assert_array_equal(p.points, pts.astype(np.float32))
        expect = (t_abs - t_abs.min()) / (t_abs.max() - t_abs.min())
        np.testing.assert_allclose(p.timestamps, expect, atol=1e-5)

    def test_nan_rows_dropped(self, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        pts[3, 1] = np.nan
        pts[7, 0] = np.inf
        (p,) = _roundtrip(lambda w: w.write_cloud_xyz(0.0, pts))
        assert p.points.shape == (8, 3)
        assert np.isfinite(p.points).all()

    def test_bad_magic_and_truncation(self):
        with pytest.raises(ValueError, match="magic"):
            list(sm.StreamReader(io.BytesIO(b"JUNK\x00rest")))
        buf = io.BytesIO()
        w = sm.StreamWriter(buf)
        w.write_imu(0.0, [0, 0, 9.8], [0, 0, 0])
        data = buf.getvalue()[:-3]           # cut the payload short
        with pytest.raises(ValueError, match="truncated"):
            list(sm.StreamReader(io.BytesIO(data)))

    def test_length_mismatch_rejected(self):
        buf = io.BytesIO()
        w = sm.StreamWriter(buf)
        with pytest.raises(ValueError, match="bytes"):
            w.write_cloud(0.0, b"\x00" * 10, 2, 12)


class TestPlayback:
    def test_play_matches_direct_feed(self, tmp_path):
        """A recorded log played through the pipeline must reproduce the
        directly-fed pipeline exactly (same feed_imu/feed_scan sequence)."""
        from svnicp_tpu import config as cfg_mod
        from svnicp_tpu.core.imu import GRAVITY
        from svnicp_tpu.io import datasets
        from svnicp_tpu.runtime import pipeline as pl

        cfg = cfg_mod.PipelineConfig(
            icp=cfg_mod.SteinICPConfig(
                particle_count=8, iterations=20, lr=1.0, max_dist=2.8,
                knn_count=16, early_stop=True,
                source_capacity=1024, target_capacity=8192),
            map=cfg_mod.MapConfig(voxel_size=1.0, max_points_per_voxel=10,
                                  max_range=120.0, capacity=32768),
            preprocess=cfg_mod.PreprocessConfig(
                min_range=1.0, max_range=50.0, voxel_size=1.0,
                raw_capacity=8192),
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
        )
        path = str(tmp_path / "seq.svnl")
        gt = sm.record_synthetic(path, n_frames=8, seed=11, n_points=3000,
                                 with_time_field=False)

        pipe_log = pl.LIOPipeline(cfg)
        with open(path, "rb") as f:
            n = sm.play(pipe_log, f)
        assert n == 8

        # direct feed of the identical data (same generator, same order)
        pipe_direct = pl.LIOPipeline(cfg)
        world = datasets.SyntheticWorld(extent=40.0, seed=11)
        times, rots, trans = datasets.synthetic_trajectory(
            8, dt=0.1, speed=1.5, seed=11, ramp_seconds=1.0)
        rng = np.random.default_rng(11)
        imu = datasets.synthetic_imu(times, rots, trans, GRAVITY)
        scans = [world.scan_at(rng, rots[i], trans[i], n_points=3000,
                               noise=0.01) for i in range(8)]
        scan_i = 0
        for t, acc, gyro in imu:
            while scan_i < 8 and times[scan_i] <= t:
                pipe_direct.feed_scan(float(times[scan_i]), scans[scan_i])
                scan_i += 1
            pipe_direct.feed_imu(float(t), acc, gyro)
        while scan_i < 8:
            pipe_direct.feed_scan(float(times[scan_i]), scans[scan_i])
            scan_i += 1
        pipe_direct.flush()

        np.testing.assert_allclose(pipe_log.trajectory(),
                                   pipe_direct.trajectory(),
                                   rtol=1e-5, atol=1e-6)

        # and the log tracks ground truth
        from svnicp_tpu.io import metrics

        ate = metrics.ate_rmse(pipe_log.trajectory(), gt, align="first")
        assert ate < 0.3, f"stream-played ATE {ate}"

    def test_cli_record_and_stream(self, tmp_path, capsys):
        """The stream CLI end-to-end: record a log, play it back."""
        import json

        from svnicp_tpu import cli

        log = str(tmp_path / "cli.svnl")
        gtp = str(tmp_path / "gt.npy")
        cli.main(["record", "--log", log, "--frames", "6",
                  "--points", "2500", "--gt", gtp])
        out = str(tmp_path / "records.jsonl")
        cli.main(["stream", "--log", log, "--gt", gtp, "--output", out])
        lines = capsys.readouterr().out.strip().splitlines()
        summary = json.loads(lines[-1])
        assert summary["frames"] == 6
        assert "ate_rmse_m" in summary
        recs = [json.loads(ln) for ln in open(out)]
        kinds = {r["_type"] for r in recs}
        assert "RuntimeRecord" in kinds and "VarianceRecord" in kinds


class TestProxyDataset:
    def test_record_proxy_roundtrip(self, tmp_path):
        """The realistic-proxy recorder (motion-distorted HDL-64 raycast
        sweeps + noisy IMU) writes a playable SVNL log: interleaved packet
        order, per-point times in [0,1], genuine motion distortion (points
        change with sweep fraction), mid-sweep ground truth."""
        from svnicp_tpu.io import stream as sm
        from svnicp_tpu.io.stream import CloudPacket, ImuPacket, StreamReader

        path = str(tmp_path / "proxy.svnl")
        gt = sm.record_proxy(path, n_frames=2, col_step=45, imu_rate=50.0,
                             dropout=0.0, extent=30.0)
        assert gt.shape == (2, 4, 4)
        clouds, imus = [], []
        last_cloud_stamp = None
        with open(path, "rb") as f:
            for pkt in StreamReader(f):
                if isinstance(pkt, CloudPacket):
                    clouds.append(pkt)
                    last_cloud_stamp = pkt.stamp
                else:
                    imus.append(pkt)
        assert len(clouds) == 2 and len(imus) >= 8
        for c in clouds:
            assert len(c.points) > 500
            assert c.timestamps is not None
            assert 0.0 <= c.timestamps.min() and c.timestamps.max() <= 1.0
            # a rotating sweep covers (almost) the full [0,1) fraction range
            assert c.timestamps.max() - c.timestamps.min() > 0.8
        # scans stamped mid-sweep: stamp sits strictly between IMU stamps
        assert any(i.stamp < last_cloud_stamp for i in imus)
        assert any(i.stamp > last_cloud_stamp for i in imus)
        # IMU noise/bias present: gyro of a (near-)planar trajectory is not
        # identically the clean rates (bias alone shifts the mean)
        g = np.stack([i.gyro for i in imus])
        assert g.std(axis=0).max() > 1e-4

    def test_raycast_sweep_is_motion_distorted(self):
        """The same world rendered with and without inter-sweep motion must
        differ: column poses move along the sweep (the distortion deskew
        inverts). Static pose0==pose1 must agree with plain raycasting."""
        from svnicp_tpu.io import datasets

        world = datasets.SyntheticWorld(extent=30.0, seed=2)
        r = np.eye(3)
        t0 = np.array([0.0, 0.0, 0.8])
        t1 = t0 + np.array([1.5, 0.0, 0.0])     # fast sweep motion
        pts_static, tau_s, (mr, mt) = datasets.raycast_sweep(
            world._surfaces, r, t0, r, t0, col_step=45, noise=0.0,
            rng=np.random.default_rng(0))
        pts_moving, tau_m, (mr2, mt2) = datasets.raycast_sweep(
            world._surfaces, r, t0, r, t1, col_step=45, noise=0.0,
            rng=np.random.default_rng(0))
        np.testing.assert_allclose(mt, t0, atol=1e-6)
        np.testing.assert_allclose(mt2, t0 + [0.75, 0, 0], atol=1e-6)
        # late-sweep columns observed from a moved pose -> different returns
        assert pts_static.shape != pts_moving.shape or not np.allclose(
            pts_static, pts_moving, atol=1e-3)

    def test_record_proxy_loop_path(self, tmp_path):
        """`path_shape='loop'` writes a circle that closes: ground truth
        returns to the start pose after one revolution, and scans honor the
        capped range (the closure scenario needs range < diameter)."""
        from svnicp_tpu.io import stream as sm
        from svnicp_tpu.io.stream import CloudPacket, StreamReader

        path = str(tmp_path / "loop.svnl")
        # speed pi/2 at radius 1 -> circle closes at t=4 s = frame 40
        gt = sm.record_proxy(path, n_frames=41, frame_dt=0.1, imu_rate=20.0,
                             speed=np.pi / 2, path_shape="loop",
                             loop_radius=1.0, scan_range=5.0, extent=8.0,
                             col_step=90, dropout=0.0)
        d_close = np.linalg.norm(gt[40, :3, 3] - gt[0, :3, 3])
        d_far = np.linalg.norm(gt[20, :3, 3] - gt[0, :3, 3])
        assert d_close < 0.1 and d_far > 1.5
        with open(path, "rb") as f:
            for pkt in StreamReader(f):
                if isinstance(pkt, CloudPacket) and len(pkt.points):
                    r = np.linalg.norm(pkt.points, axis=1)
                    assert r.max() < 5.5    # scan_range + noise
                    break
