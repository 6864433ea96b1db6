"""Pipeline-level transcript parity: a numpy/f64 transcription of the
reference's per-frame odometry loop (OdometryPipeline.cpp:449-658) run for 5
frames against the jitted pipeline on identical scans.

The align-core transcript (test_reference_parity.py) guards the registration
math; this guards everything AROUND it — crop, two-stage uniform downsample,
map insert semantics, map query, candidate pre-pairing, constant-velocity /
ESKF prediction, the ESKF fusion update, and the frame-to-frame state
bookkeeping — against drift, by asserting the two implementations produce
the same trajectory.

Transcription ground rules (why agreement is exact up to f32 accumulation):
- per-voxel caps / capacity shedding / radius eviction / target truncation
  are configured NOT to bind (caps large, ranges large), because when they
  bind the kept subset depends on the device hash-compaction order, which a
  faithful numpy transcription would have to replicate bit-for-bit;
- selection ties (two points equidistant from a voxel centroid, equidistant
  candidates) are measure-zero for random float clouds;
- the per-frame particle prior is drawn with the SAME jax PRNG stream in
  both (the PRNG is not the math under test);
- early stop is off and iterations kept below the Stein-equilibrium regime
  where f32/f64 differences amplify chaotically (see test_sharding.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnicp_tpu import config as cfg_mod
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.io import datasets
from svnicp_tpu.runtime import pipeline as pl

from test_reference_parity import (np_left_jacobian, np_so3_exp, np_so3_log,
                                   reference_svn_align)

GRAVITY = 9.782940329221166        # ref: IMU.h:24


# ---------------------------------------------------------------- numpy lie

def np_se3_exp(xi):
    """[rho, omega] -> (R, t) with t = J_l(omega) rho (geometry.se3_exp)."""
    r = np_so3_exp(xi[3:])
    t = np_left_jacobian(xi[3:]) @ xi[:3]
    return r, t


def np_se3_log(r, t):
    omega = np_so3_log(r)
    rho = np.linalg.solve(np_left_jacobian(omega), t)
    return np.concatenate([rho, omega])


def np_euler_zyx(rot_vec):
    """Rz(yaw) Ry(pitch) Rx(roll) of (roll, pitch, yaw) = rot_vec
    (geometry.euler_zyx_to_matrix; ref IMU.cpp:51-53)."""
    cr, sr = np.cos(rot_vec[0]), np.sin(rot_vec[0])
    cp, sp = np.cos(rot_vec[1]), np.sin(rot_vec[1])
    cy, sy = np.cos(rot_vec[2]), np.sin(rot_vec[2])
    return np.array([
        [cp * cy, sr * sp * cy - cr * sy, sr * sy + cr * sp * cy],
        [cp * sy, cr * cy + sr * sp * sy, cr * sp * sy - sr * cy],
        [-sp, sr * cp, cr * cp],
    ])


def np_skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


# ------------------------------------------------------- numpy preprocessing

def np_crop(points, min_range, max_range):
    d2 = (points ** 2).sum(-1)
    return points[(d2 < max_range ** 2) & (d2 > min_range ** 2)]


def np_downsample_uniform(points, voxel_size):
    """One point per floor-grid voxel, nearest the voxel centroid
    (pointcloud.downsample_uniform / PCL UniformSampling,
    ref OdometryPipeline.cpp:684-690)."""
    keys = np.floor(points / voxel_size).astype(np.int64)
    center = (keys + 0.5) * voxel_size
    d = ((points - center) ** 2).sum(-1)
    flat = keys[:, 0] * (1 << 40) + keys[:, 1] * (1 << 20) + keys[:, 2]
    order = np.lexsort((d, flat))
    sk = flat[order]
    first = np.concatenate([[True], sk[1:] != sk[:-1]])
    return points[order[first]]


class NpVoxelMap:
    """Insertion-ordered voxel map mirroring core/voxmap semantics
    (ref VoxelHashMap.cpp:22-41): per-voxel cap, first-come-first-kept,
    trunc-toward-zero voxel ids."""

    def __init__(self, voxel_size, max_points_per_voxel):
        self.voxel_size = voxel_size
        self.cap = max_points_per_voxel
        self.voxels: dict = {}

    def insert(self, world_points):
        keys = np.trunc(world_points / self.voxel_size).astype(np.int64)
        for p, k in zip(world_points, map(tuple, keys)):
            lst = self.voxels.setdefault(k, [])
            if len(lst) < self.cap:
                lst.append(p)

    def all_points(self):
        return np.concatenate([np.stack(v) for v in self.voxels.values()])


def np_knn_topk(source, target, k):
    """Exact k-NN candidate points per source row (knn.knn_candidates with
    candidate_method=topk; ref SVGDICP.cpp:201-215)."""
    d2 = ((source[:, None, :] - target[None]) ** 2).sum(-1)
    idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
    row = np.arange(len(source))[:, None]
    sub = np.take_along_axis(d2, idx, axis=1)
    srt = np.argsort(sub, axis=1)
    return target[idx[row, srt]]


# ------------------------------------------------------------- numpy ESKF

class NpESKF:
    """15-state ESKF transcription (core/eskf.py; ref ESEKF.cpp)."""

    def __init__(self, lio: cfg_mod.LIOConfig, noise: cfg_mod.IMUNoiseConfig):
        d2r = np.pi / 180.0
        diag = np.concatenate([
            np.asarray(lio.init_pos_std) ** 2,
            np.asarray(lio.init_vel_std) ** 2,
            (np.asarray(lio.init_rot_std) * d2r) ** 2,
            np.asarray(noise.bg_std) ** 2,
            np.asarray(noise.ba_std) ** 2,
        ])
        self.cov = np.diag(diag)
        self.r = np.eye(3)
        self.t = np.zeros(3)
        self.v = np.zeros(3)
        self.bg = np.zeros(3)
        self.ba = np.zeros(3)
        self.noise = noise

    def predict_window(self, window):
        """pipeline._imu_scan_predict: prev starts as window[0] and every
        window element (including [0]) is a finish sample."""
        if not window:
            return
        prev = window[0]
        for cur in window:
            self._predict(prev, cur)
            prev = cur

    def _predict(self, prev, cur):
        dt_p, acc_p, gyro_p = prev
        dt_c, acc_c, gyro_c = cur
        acc_c = acc_c - self.ba           # compensate cur only (eskf.predict)
        gyro_c = gyro_c - self.bg
        r_prev = self.r.copy()
        # strapdown propagate (imu.propagate; ref IMU.cpp:20-58) — note the
        # start sample stays UNcompensated, as in _imu_scan_predict
        g = np.array([0.0, 0.0, -GRAVITY])
        d_vfn = r_prev @ (acc_p * dt_p)
        vel = self.v + d_vfn + (r_prev @ g) * dt_c
        self.t = self.t + self.v * dt_c + 0.5 * g * dt_c ** 2 + 0.5 * d_vfn * dt_c
        self.r = r_prev @ np_euler_zyx(gyro_p * dt_c)
        self.v = vel
        # covariance propagation (eskf.predict; ref ESEKF.cpp:45-63)
        phi = np.eye(15)
        phi[0:3, 3:6] = np.eye(3) * dt_c
        phi[3:6, 6:9] = np_so3_exp(r_prev @ acc_c) * dt_c   # reference term
        phi[3:6, 12:15] = r_prev * dt_c
        phi[6:9, 9:12] = -r_prev * dt_c
        q = np.zeros((15, 15))
        q[3:6, 3:6] = r_prev @ np.diag(np.asarray(self.noise.vel_rw) ** 2) @ r_prev.T * dt_c
        q[6:9, 6:9] = r_prev @ np.diag(np.asarray(self.noise.rot_rw) ** 2) @ r_prev.T * dt_c
        q[9:12, 9:12] = 2.0 * np.diag(np.asarray(self.noise.bg_std) ** 2) * dt_c
        q[12:15, 12:15] = 2.0 * np.diag(np.asarray(self.noise.ba_std) ** 2) * dt_c
        self.cov = phi @ self.cov @ phi.T + q

    def update(self, icp_cov, correction):
        """eskf.update (ref ESEKF.cpp:71-99, bias offsets fixed)."""
        h = np.zeros((6, 15))
        h[0:3, 0:3] = np.eye(3)
        h[3:6, 6:9] = np.eye(3)
        s = h @ self.cov @ h.T + icp_cov
        gain = self.cov @ h.T @ np.linalg.inv(s)
        delta = gain @ correction
        self.cov = self.cov - gain @ h @ self.cov
        r_err = np_so3_exp(delta[6:9])
        r_new = self.r @ r_err
        t_new = self.r @ delta[0:3] + self.t
        self.v = self.v + r_new @ delta[3:6]
        self.r, self.t = r_new, t_new
        self.bg = self.bg + delta[9:12]
        self.ba = self.ba + delta[12:15]


# -------------------------------------------------------- numpy mini pipeline

def reference_mini_pipeline(cfg: cfg_mod.PipelineConfig, scans, times,
                            imu_stream=None):
    """The reference odometry loop (OdometryPipeline.cpp:449-658) in f64."""
    icp = cfg.icp
    pp = cfg.preprocess
    vmap = NpVoxelMap(cfg.map.voxel_size, cfg.map.max_points_per_voxel)
    eskf = NpESKF(cfg.lio, cfg.imu) if cfg.lio.estimator == "kf" else None
    imu_queue = list(imu_stream or [])

    key = jax.random.PRNGKey(cfg.seed)
    pose_r, pose_t = np.eye(3), np.zeros(3)
    prev_r, prev_t = np.eye(3), np.zeros(3)
    pose_time = prev_time = 0.0
    traj = []
    lb = np.asarray(icp.init_lb, cfg.np_dtype)
    ub = np.asarray(icp.init_ub, cfg.np_dtype)

    for fi, (t_frame, scan) in enumerate(zip(times, scans)):
        # --- IMU window (samples with stamp <= frame stamp; stamps chosen to
        # coincide with IMU samples so no boundary interpolation happens)
        if eskf is not None and fi > 0:
            window = []
            while imu_queue and imu_queue[0][0] <= t_frame + 1e-12:
                window.append(imu_queue.pop(0)[1])
            eskf.predict_window(window)
        elif eskf is not None:
            while imu_queue and imu_queue[0][0] <= t_frame + 1e-12:
                imu_queue.pop(0)

        # --- preprocess (ref :549-560)
        cropped = np_crop(scan.astype(np.float64), pp.min_range, pp.max_range)
        to_map = np_downsample_uniform(cropped, 0.5 * pp.voxel_size)
        source = np_downsample_uniform(to_map, 1.5 * pp.voxel_size)

        # --- predict (ref :564, :706-737)
        if eskf is not None:
            guess_r, guess_t = eskf.r.copy(), eskf.t.copy()
        elif fi >= 2:
            rd = prev_r.T @ pose_r
            td = prev_r.T @ (pose_t - prev_t)
            xi = np_se3_log(rd, td)
            dt_hist = pose_time - prev_time
            ratio = (t_frame - pose_time) / max(dt_hist, 1e-9) if dt_hist > 0 else 0.0
            ri, ti = np_se3_exp(ratio * xi)
            guess_r = pose_r @ ri
            guess_t = pose_r @ ti + pose_t
        else:
            guess_r, guess_t = pose_r.copy(), pose_t.copy()

        if fi == 0:
            # bootstrap (ref :583-591): seed map with the CROPPED cloud
            vmap.insert(cropped @ guess_r.T + guess_t)
            prev_r, prev_t = pose_r, pose_t
            prev_time = pose_time
            pose_r, pose_t = guess_r, guess_t
            pose_time = t_frame
            traj.append((pose_r.copy(), pose_t.copy()))
            continue

        # --- fresh particle prior, SAME jax PRNG stream as the pipeline
        # (drawn at cfg.dtype: the f64 pipeline consumes the stream as f64)
        key, sub = jax.random.split(key)
        init = np.asarray(
            lb + (ub - lb) * np.asarray(jax.random.uniform(sub, (icp.particle_count, 6),
                                                           jnp.dtype(cfg.dtype)))
        ).astype(np.float64)

        # --- map query + stage-1 KNN (ref :576-581; radius covers the map)
        target = vmap.all_points()
        src_guess = source @ guess_r.T + guess_t
        cand = np_knn_topk(src_guess, target, icp.knn_count)

        # --- align (the core transcript from test_reference_parity)
        history = reference_svn_align(
            source.astype(np.float64), cand,
            np.ones(cand.shape[:2], bool), guess_r, guess_t, init,
            icp, icp.iterations, full_grad=icp.svn_full_grad,
        )
        particles = history[-1]                      # [P,6] local [t, logR]
        mean = particles.mean(0)
        centered = particles - mean
        var = (centered ** 2).mean(0)

        # --- update (ref :615, :739-796)
        if eskf is not None:
            scales = np.asarray(cfg.lio.icp_cov_scales)
            eskf.update(np.diag(var * scales), mean)
            new_r, new_t = eskf.r.copy(), eskf.t.copy()
        else:
            rc, tc = np_so3_exp(mean[3:]), mean[:3]
            new_r = guess_r @ rc
            new_t = guess_r @ tc + guess_t

        # --- map update with the finer cloud (ref :630)
        vmap.insert(to_map @ new_r.T + new_t)

        prev_r, prev_t = pose_r, pose_t
        prev_time = pose_time
        pose_r, pose_t = new_r, new_t
        pose_time = t_frame
        traj.append((pose_r.copy(), pose_t.copy()))
    return traj


# ------------------------------------------------------------------- fixtures

N_FRAMES = 5


def transcript_cfg(estimator="icp", **over):
    base = dict(
        icp=cfg_mod.SteinICPConfig(
            particle_count=4, iterations=12, lr=1.0, max_dist=2.8,
            knn_count=16, early_stop=False, candidate_method="topk",
            source_capacity=2048, target_capacity=16384,
        ),
        # caps/ranges chosen so no truncation path binds (see module docstring)
        map=cfg_mod.MapConfig(voxel_size=1.0, max_points_per_voxel=100,
                              max_range=300.0, capacity=32768),
        preprocess=cfg_mod.PreprocessConfig(min_range=1.0, max_range=80.0,
                                            voxel_size=1.0, raw_capacity=4096),
        lio=cfg_mod.LIOConfig(estimator=estimator, frame_gap_seconds=0.0),
    )
    base.update(over)
    return cfg_mod.PipelineConfig(**base)


def make_sequence(seed=11, n_points=1500):
    world = datasets.SyntheticWorld(extent=40.0, seed=seed)
    times, rots, trans = datasets.synthetic_trajectory(
        N_FRAMES, dt=0.1, speed=1.2, seed=seed)
    rng = np.random.default_rng(seed)
    scans = [world.scan_at(rng, rots[i], trans[i], n_points=n_points, noise=0.01)
             for i in range(N_FRAMES)]
    return times, rots, trans, scans


def run_pipeline(cfg, times, scans, imu_stream=None):
    pipe = pl.LIOPipeline(cfg)
    if imu_stream:
        for t, (dt, acc, gyro) in imu_stream:
            pipe.feed_imu(t, acc, gyro)
    for i in range(N_FRAMES):
        pipe.feed_scan(float(times[i]), scans[i])
    return pipe


def assert_trajectories_agree(pipe, ref_traj, atol_t, atol_r):
    assert len(pipe.outputs) == len(ref_traj) == N_FRAMES
    for i, (r_ref, t_ref) in enumerate(ref_traj):
        t_ours = np.asarray(pipe.outputs[i].pose_t, np.float64)
        r_ours = np.asarray(pipe.outputs[i].pose_r, np.float64)
        dt_err = np.linalg.norm(t_ours - t_ref)
        dr_err = np.linalg.norm(np_so3_log(r_ref.T @ r_ours))
        assert dt_err < atol_t, f"frame {i}: translation drift {dt_err}"
        assert dr_err < atol_r, f"frame {i}: rotation drift {dr_err}"


class TestPipelineTranscript:
    def test_icp_mode_trajectory_parity(self):
        """Full loop in ICP mode: constant-velocity prediction + exp-compose
        update (ref :706-737, :37-45)."""
        times, _, _, scans = make_sequence()
        cfg = transcript_cfg("icp")
        pipe = run_pipeline(cfg, times, scans)
        ref = reference_mini_pipeline(cfg, scans, times)
        assert_trajectories_agree(pipe, ref, atol_t=2e-3, atol_r=2e-3)

    def test_kf_mode_trajectory_parity(self):
        """Full loop in KF mode: IMU-window ESKF predict + fusion update
        (ref :475-530, :739-796, ESEKF.cpp)."""
        times, rots, trans, scans = make_sequence(seed=12)
        cfg = transcript_cfg(
            "kf",
            imu=cfg_mod.IMUNoiseConfig.from_yaml_units(
                [2.0, 2.0, 10.0], [50.0] * 3, [20.0] * 3, [500.0] * 3),
        )
        # IMU at exactly 10 samples per frame interval so frame stamps always
        # coincide with an IMU stamp (no boundary interpolation — that path
        # has its own unit tests)
        imu = []
        raw = list(datasets.synthetic_imu(times, rots, trans, GRAVITY))
        last_t = None
        for t, acc, gyro in raw:
            dt = 0.0 if last_t is None else t - last_t
            last_t = t
            imu.append((t, (dt, np.asarray(acc, np.float64),
                            np.asarray(gyro, np.float64))))
        pipe = run_pipeline(cfg, times, scans, imu_stream=imu)
        ref = reference_mini_pipeline(cfg, scans, times,
                                      imu_stream=imu)
        assert_trajectories_agree(pipe, ref, atol_t=3e-3, atol_r=3e-3)

    def test_float64_pipeline_parity(self):
        """dtype float64 END TO END (the reference's precision,
        SVGDICP.h:207): the same 5-frame loop with `cfg.dtype: float64`
        under jax x64 must agree with the f64 numpy transcript to ~machine
        precision — 3 orders of magnitude tighter than the f32 run's
        tolerance — proving the dtype plumbing reaches every stage (upload,
        preprocess, map, align, update) rather than silently casting back
        to f32 anywhere. TPU caveat recorded in docs/PARITY.md: f64 on TPU
        is emulated and slow; this option is for CPU verification runs and
        precision-sensitive offline work."""
        times, _, _, scans = make_sequence(seed=13)
        cfg = transcript_cfg("icp", dtype="float64")
        with jax.enable_x64(True):
            pipe = run_pipeline(cfg, times, scans)
            ref = reference_mini_pipeline(cfg, scans, times)
        assert_trajectories_agree(pipe, ref, atol_t=1e-6, atol_r=1e-6)

    def test_transcript_tracks_ground_truth(self):
        """Sanity: the transcription itself is a working odometry (guards
        against a degenerate both-wrong agreement)."""
        times, rots, trans, scans = make_sequence()
        cfg = transcript_cfg("icp")
        ref = reference_mini_pipeline(cfg, scans, times)
        t_last = ref[-1][1]
        err = np.linalg.norm(t_last - (trans[-1] - trans[0]))
        assert err < 0.15, f"transcript end-pose error {err}"
