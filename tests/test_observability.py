"""Observability parity: particle history, real stage timings, KF gain echo,
IMU-window drop accounting (VERDICT round-1 items 3 + 7).

Reference behaviors being mirrored:
- /svnicp/all_particles per-iteration particle history
  (ref: OdometryPipeline.cpp:966-985 fed by SVNICP.cpp:103-107);
- Runtime msg stage timings (ref: OdometryPipeline.cpp:987-995);
- KF gain + covariance debug echo (ref: OdometryPipeline.cpp:789-795).
"""

import dataclasses
import json

import numpy as np
import pytest

from svnicp_tpu import config as cfg_mod
from svnicp_tpu.io import datasets
from svnicp_tpu.runtime import pipeline as pl

from test_pipeline import run_sequence, small_cfg


@pytest.fixture(scope="module")
def world():
    return datasets.SyntheticWorld(extent=40.0, seed=3)


class TestParticleHistory:
    def test_history_emitted_from_live_pipeline(self, world):
        cfg = small_cfg(save_particles=True)
        pipe, _ = run_sequence(cfg, world, n_frames=3)
        out = pipe.outputs[-1]
        it = cfg.icp.iterations
        p = cfg.icp.particle_count
        assert out.history.shape == (it, p, 6)
        n_run = int(out.icp_iterations)
        assert 1 <= n_run <= it
        h = np.asarray(out.history)
        assert np.isfinite(h).all()
        # iterations actually run: particles move; afterwards: frozen
        if n_run >= 2:
            assert not np.allclose(h[0], h[n_run - 1])
        if n_run < it:
            assert np.allclose(h[n_run - 1], h[-1])
        # the last history row IS the final particle set
        assert np.allclose(h[-1], np.asarray(out.particles), atol=1e-6)

    def test_history_off_by_default(self, world):
        cfg = small_cfg()
        pipe, _ = run_sequence(cfg, world, n_frames=2)
        assert pipe.outputs[-1].history.shape[0] == 0

    def test_save_particles_requires_svn(self):
        with pytest.raises(ValueError, match="save_particles"):
            small_cfg(
                icp=cfg_mod.SteinICPConfig(method="svgd", particle_count=8),
                save_particles=True,
            )


class TestStageTimings:
    def test_frame_timings_populated(self, world):
        cfg = small_cfg()
        pipe, _ = run_sequence(cfg, world, n_frames=4)
        assert len(pipe.frame_timings) == len(pipe.outputs) == 4
        for ft in pipe.frame_timings:
            assert ft["preprocessing_time"] > 0.0
            assert ft["steinicp_time"] > 0.0

    def test_stage_ahead_timings_per_frame(self, world):
        cfg = small_cfg(
            preprocess=cfg_mod.PreprocessConfig(
                min_range=1.0, max_range=50.0, voxel_size=1.0,
                raw_capacity=8192, host_downsample=True),
            stage_ahead=True,
        )
        pipe, _ = run_sequence(cfg, world, n_frames=5)
        pipe.close()
        assert len(pipe.frame_timings) == len(pipe.outputs) == 5
        for ft in pipe.frame_timings[1:]:
            assert ft["preprocessing_time"] > 0.0


class TestKFGain:
    def test_gain_and_cov_exposed(self, world):
        cfg = small_cfg(
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
            imu=cfg_mod.IMUNoiseConfig.from_yaml_units(
                [2.0, 2.0, 10.0], [50.0] * 3, [20.0] * 3, [500.0] * 3),
        )
        pipe, _ = run_sequence(cfg, world, n_frames=4, with_imu=True)
        out = pipe.outputs[-1]
        assert out.kf_gain.shape == (15, 6)
        assert out.kf_cov_diag.shape == (15,)
        g = np.asarray(out.kf_gain)
        assert np.isfinite(g).all() and np.abs(g).max() > 0.0
        assert (np.asarray(out.kf_cov_diag) > 0.0).all()

    def test_icp_mode_gain_zero(self, world):
        cfg = small_cfg()
        pipe, _ = run_sequence(cfg, world, n_frames=2)
        assert np.abs(np.asarray(pipe.outputs[-1].kf_gain)).max() == 0.0


class TestIMUDropAccounting:
    def test_long_gap_counts_drops(self, world, capsys):
        cfg = small_cfg(
            lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
        )
        pipe = pl.LIOPipeline(cfg)
        pipe.imu_window = 16
        rng = np.random.default_rng(0)
        rots = np.tile(np.eye(3), (2, 1, 1))
        trans = np.zeros((2, 3))
        # 40 IMU samples at 100 Hz between the two frames: 24 must drop
        pipe.feed_scan(0.0, world.scan_at(rng, rots[0], trans[0], n_points=2000))
        for i in range(40):
            pipe.feed_imu(0.01 * (i + 1), [0.0, 0.0, 9.78], [0.0, 0.0, 0.0])
        out = pipe.feed_scan(0.5, world.scan_at(rng, rots[1], trans[1], n_points=2000))
        # the interpolated boundary sample can add one entry to the window
        assert int(out.imu_dropped) >= 24
        assert pipe.imu_dropped_total == int(out.imu_dropped)
        assert "IMU window overflow" in capsys.readouterr().err

    def test_normal_window_no_drops(self, world):
        cfg = small_cfg(lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0))
        pipe, _ = run_sequence(cfg, world, n_frames=4, with_imu=True)
        assert pipe.imu_dropped_total == 0
        assert all(int(o.imu_dropped) == 0 for o in pipe.outputs)


class TestCLIRecords:
    def test_demo_jsonl_contains_all_observability_records(self, tmp_path):
        from svnicp_tpu import cli

        out_path = tmp_path / "records.jsonl"
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(
            "icp:\n  particle_count: 8\n  iterations: 20\n  knn_count: 16\n"
            "  source_capacity: 1024\n  target_capacity: 8192\n"
            "preprocess:\n  max_range: 50.0\n  raw_capacity: 8192\n"
            "map:\n  capacity: 32768\n"
            "lio:\n  estimator: kf\n  frame_gap_seconds: 0.0\n"
        )
        cli.main(["demo", "--frames", "4", "--points", "1500",
                  "--config", str(cfg_path), "--output", str(out_path),
                  "--save-particles"])
        by_type = {}
        for line in out_path.read_text().splitlines():
            rec = json.loads(line)
            by_type.setdefault(rec["_type"], []).append(rec)
        # runtime records carry REAL stage splits (not stubs)
        runtimes = by_type["RuntimeRecord"]
        assert any(r["preprocessing_time"] > 0.0 for r in runtimes)
        assert all(r["steinicp_time"] > 0.0 for r in runtimes)
        assert any(r["finish_iter"] >= 1 for r in runtimes)
        # per-iteration particle history (frames after bootstrap)
        hists = by_type["ParticleHistoryRecord"]
        assert len(hists) >= 3
        h0 = hists[-1]
        assert len(h0["x"]) == h0["iterations"] >= 1
        assert len(h0["x"][0]) == 8
        # KF gain echo with the icp covariance that produced it
        gains = by_type["KFGainRecord"]
        assert len(gains) == 4
        g = np.asarray(gains[-1]["gain"])
        assert g.shape == (15, 6) and np.isfinite(g).all()
        assert np.asarray(gains[-1]["icp_cov"]).shape == (6, 6)
        assert len(gains[-1]["kf_cov_diag"]) == 15
