"""Degenerate-scene behavior at the FULL pipeline level (KF mode).

The paper's core claim is that the SVN particle spread is an online
observability measure: in under-constrained geometry the per-frame ICP
variance must blow up exactly along the unobservable directions, the ESKF
must then lean on the IMU there, and the filter must not diverge. The
reference validated this on real datasets only; these tests construct the
degenerate geometries synthetically (corridor / tunnel / plane,
io.datasets.DegenerateWorld) and assert the anisotropy, the containment,
and the covariance calibration end to end.

Variance index order: [x, y, z, roll, pitch, yaw] (particle coords [t, logR]).

Host-independence note: the equilibrium Stein dynamics are chaotic, so at
f32 the per-host XLA:CPU codegen differences (reduction reassociation,
~1e-7) amplify to O(1) trajectory/variance shifts — the round-2 thresholds
calibrated on one machine failed on another (tunnel dominance measured 3x
here, 1.47x there). The anisotropy tests therefore run the pipeline at
`dtype: float64`, where the same reassociation noise (~1e-16) stays below
~1e-10 after amplification: identical seeds give the same variances on any
host, and the thresholds below carry >=2x measured margin.
"""

import numpy as np
import pytest

import jax

from svnicp_tpu import config as cfg_mod
from svnicp_tpu.core.imu import GRAVITY
from svnicp_tpu.io import datasets
from svnicp_tpu.runtime import pipeline as pl

N_FRAMES = 10
DT = 0.1
SPEED = 1.0


def kf_cfg(equilibrium: bool = False, **over):
    """`equilibrium=True` runs the ensemble to its Stein equilibrium (no
    early stop): the spread along unobservable directions keeps growing by
    kernel repulsion after the mean has converged, so anisotropy is fully
    expressed — the early-stopped operating point shows the same effect but
    ~2-3x weaker.

    The equilibrium anisotropy tests run the point-to-plane residual (the
    framework's flagship operating point): under it the unobservable-
    direction invariance is STRUCTURAL — every tunnel/corridor facet normal
    is orthogonal to x, so n.(q - p) is exactly invariant to x-translation
    and nothing bounds the x-spread but the prior box. Point-to-point
    against a discretely-sampled map is NOT invariant: nearest-neighbor
    matching locks onto the map's point-sampling texture (~0.16 m spacing
    here), which constrains x almost as strongly as the 1 cm scan noise
    constrains y — measured x/y variance ratio only ~1.5x at f64, too weak
    an effect to assert on (and exactly what round 2's cross-host failure
    was). The early-stopped p2p tests below keep the reference residual."""
    base = dict(
        icp=cfg_mod.SteinICPConfig(
            particle_count=8, iterations=60 if equilibrium else 30, lr=1.0,
            max_dist=2.8, knn_count=16,
            residual="point_to_plane" if equilibrium else "point_to_point",
            # MAP prior term: without it the pure-likelihood posterior is
            # IMPROPER along null directions — particles random-walk at the
            # clip limit and the "variance" is a chaotic function of the
            # iteration count (measured x/z swinging 2.7-62x across codegen
            # variants). With it the spread contracts to the prior variance
            # along nulls, giving a stable, physically meaningful statistic:
            # v_d/prior_var_d ~ 0.2-0.4 for unobservable dims, orders of
            # magnitude below that for observable ones.
            prior_information=equilibrium,
            early_stop=not equilibrium, convergence_threshold=5e-4,
            source_capacity=1024, target_capacity=16384,
        ),
        map=cfg_mod.MapConfig(voxel_size=0.5, max_points_per_voxel=10,
                              max_range=120.0, capacity=65536),
        preprocess=cfg_mod.PreprocessConfig(min_range=1.0, max_range=50.0,
                                            voxel_size=0.5, raw_capacity=8192),
        lio=cfg_mod.LIOConfig(estimator="kf", frame_gap_seconds=0.0),
        imu=cfg_mod.IMUNoiseConfig.from_yaml_units(
            [2.0, 2.0, 10.0], [50.0] * 3, [20.0] * 3, [500.0] * 3),
        dtype="float64",   # host-independent numerics (module docstring)
    )
    base.update(over)
    return cfg_mod.PipelineConfig(**base)


def straight_trajectory():
    times = np.arange(N_FRAMES) * DT
    rots = np.tile(np.eye(3), (N_FRAMES, 1, 1))
    trans = np.zeros((N_FRAMES, 3))
    trans[:, 0] = SPEED * times
    trans[:, 2] = 1.5
    return times, rots, trans


def run_world(world, seed=0, cfg=None):
    cfg = cfg or kf_cfg()
    times, rots, trans = straight_trajectory()
    rng = np.random.default_rng(seed)
    with jax.enable_x64(cfg.dtype == "float64"):
        pipe = pl.LIOPipeline(cfg)
        for t, acc, gyro in datasets.synthetic_imu(times, rots, trans, GRAVITY):
            pipe.feed_imu(t, acc, gyro)
        for i in range(N_FRAMES):
            pipe.feed_scan(float(times[i]),
                           world.scan_at(rng, rots[i], trans[i], n_points=4000))
    return pipe, times, rots, trans


def median_var(pipe):
    """Per-dim median ICP variance over the aligned frames."""
    v = np.stack([np.asarray(o.var_icp) for o in pipe.outputs[1:]])
    return np.median(v, axis=0)


def prior_var():
    """Variance of the per-frame particle prior box (SteinICPConfig
    init_lb/ub defaults) — the natural unit for the equilibrium spread
    under prior_information: an unobservable dim retains ~0.3-0.4 of the
    prior variance (SVGD equilibrium of the prior-only posterior), an
    observable one collapses orders of magnitude below it. Measured
    invariant to CPU codegen (AVX2 vs AVX512 identical to <3%) and to the
    scan seed — the statistic the round-2 raw-ratio assertions lacked."""
    lb = np.array([-0.3, -0.2, -0.1, -0.004, -0.004, -0.012])
    return (2 * np.abs(lb)) ** 2 / 12.0


def errors(pipe, trans):
    est = np.stack([np.asarray(o.pose_t) for o in pipe.outputs])
    return est - (trans - trans[0])


class TestCorridor:
    """Two smooth walls + floor along x: x-translation unobservable."""

    def test_anisotropic_variance_and_containment(self):
        # Prior-relative spread r = var/prior_var (see prior_var): measured
        # r_x 0.38-0.41, r_y <= 0.012, r_yaw <= 2e-4 across ISA x seed;
        # thresholds carry >= 2.5x margin. (z and roll sit at intermediate
        # r — their likelihood strength is comparable to the reference's
        # tight prior box, an honest MAP statement, so no claim on them.)
        pipe, _, _, trans = run_world(datasets.DegenerateWorld("corridor"),
                                      cfg=kf_cfg(equilibrium=True))
        r = median_var(pipe) / prior_var()
        assert r[0] > 0.15, f"x did not retain prior spread: {r}"
        assert r[1] < 0.05, f"y not constrained: {r}"
        assert r[5] < 0.01, f"yaw not constrained: {r}"
        assert r[0] > 10.0 * r[1], f"x not dominant over y: {r}"
        err = errors(pipe, trans)
        assert np.isfinite(err).all()
        # constrained dims held by ICP; unobservable x held only by the IMU
        assert np.abs(err[:, 1]).max() < 0.15, err[:, 1]
        assert np.abs(err[:, 2]).max() < 0.15, err[:, 2]
        assert np.abs(err[:, 0]).max() < 1.0, err[:, 0]
        assert all(bool(o.align_ok) for o in pipe.outputs[1:])

    def test_kf_covariance_reflects_observability(self):
        """The ESKF position covariance must stay x-dominant too: the filter
        knows it is blind along the corridor (kf_cov_diag observability
        echo, ref /svnicp/kf_gain publisher)."""
        pipe, *_ = run_world(datasets.DegenerateWorld("corridor"))
        kd = np.stack([np.asarray(o.kf_cov_diag) for o in pipe.outputs[2:]])
        pos = np.median(kd[:, 0:3], axis=0)
        assert pos[0] > 2.0 * max(pos[1], pos[2]), pos

    def test_lateral_nees_calibrated(self):
        """NEES of the CONSTRAINED dims (y, z) against the filter covariance:
        neither wildly overconfident (>> 1) nor absurdly conservative."""
        pipe, _, _, trans = run_world(datasets.DegenerateWorld("corridor"))
        err = errors(pipe, trans)
        kd = np.stack([np.asarray(o.kf_cov_diag) for o in pipe.outputs])
        vals = (err[2:, 1] ** 2 / kd[2:, 1]) + (err[2:, 2] ** 2 / kd[2:, 2])
        mean_nees = float(np.mean(vals))       # chi2(2) expectation = 2
        assert 1e-3 < mean_nees < 60.0, mean_nees


class TestTunnel:
    """Octagonal prism along x: x unobservable, cross-section constrained."""

    def test_anisotropic_variance_and_containment(self):
        # measured r_x 0.40, r_y 4.5e-4, r_z 0.12-0.13 across ISA x seed
        # (prior-relative spread, see prior_var); >= 2.5x margins
        pipe, _, _, trans = run_world(datasets.DegenerateWorld("tunnel"),
                                      cfg=kf_cfg(equilibrium=True))
        r = median_var(pipe) / prior_var()
        assert r[0] > 0.15, f"x did not retain prior spread: {r}"
        assert r[1] < 0.01, f"y not constrained: {r}"
        assert r[2] < 0.3, f"z not constrained: {r}"
        assert r[0] > 50.0 * r[1], f"x not dominant over y: {r}"
        err = errors(pipe, trans)
        assert np.isfinite(err).all()
        assert np.abs(err[:, 1]).max() < 0.15
        assert np.abs(err[:, 2]).max() < 0.15
        assert np.abs(err[:, 0]).max() < 1.0


class TestPlane:
    """Bare ground plane: x, y and yaw unobservable; z, roll, pitch held."""

    def test_anisotropic_variance_and_containment(self):
        # measured r_x = r_y = r_yaw = 0.39 (all three nulls at the prior
        # spread), r_z 2.9e-5, r_pitch 3.1e-5 across ISA x seed. Roll is
        # NOT asserted: the floor is narrow in y (+-12 m vs +-45 m of x
        # extent), so the roll lever arm is ~4x shorter than pitch's and
        # roll's likelihood is weaker than the reference's tight rotation
        # prior box — it honestly reads prior-bound (r_roll ~ 0.32).
        pipe, _, _, trans = run_world(datasets.DegenerateWorld("plane"),
                                      cfg=kf_cfg(equilibrium=True))
        r = median_var(pipe) / prior_var()
        assert r[0] > 0.15 and r[1] > 0.15, f"x/y did not retain prior: {r}"
        assert r[5] > 0.15, f"yaw did not retain prior: {r}"
        assert r[2] < 1e-2, f"z not constrained: {r}"
        assert r[4] < 1e-2, f"pitch not constrained: {r}"
        err = errors(pipe, trans)
        assert np.isfinite(err).all()
        assert np.abs(err[:, 2]).max() < 0.15   # z held by the plane


class TestHDL64Segmentation:
    """Segmentation at the REAL HDL-64 shape (64 x 2250 range image,
    ref: ImageProjection.h:63-68) fed by raycast scans with the true ray
    pattern — not subsampled point soup."""

    def test_full_resolution_pipeline(self):
        world = datasets.SyntheticWorld(extent=40.0, n_walls=18, n_boxes=12,
                                        seed=5)
        cfg = kf_cfg(
            preprocess=cfg_mod.PreprocessConfig(
                min_range=1.0, max_range=50.0, voxel_size=0.5,
                use_segmentation=True, sensor_model="hdl64",
                raw_capacity=147456),     # 64*2250 = 144000 rays
            lio=cfg_mod.LIOConfig(estimator="icp", frame_gap_seconds=0.0),
            dtype="float32",   # the f32 operating point; assertions here are
                               # coarse (err < 0.2), not margin-calibrated
        )
        times = np.arange(3) * DT
        rots = np.tile(np.eye(3), (3, 1, 1))
        trans = np.zeros((3, 3))
        trans[:, 0] = SPEED * times
        trans[:, 2] = 1.5
        rng = np.random.default_rng(0)
        pipe = pl.LIOPipeline(cfg)
        n_raw = []
        for i in range(3):
            scan = datasets.raycast_scan(world._surfaces, rots[i], trans[i],
                                         max_range=50.0, rng=rng)
            n_raw.append(len(scan))
            pipe.feed_scan(float(times[i]), scan)
        # the raycast really filled a big part of the range image
        assert min(n_raw) > 60_000, n_raw
        est = np.stack([np.asarray(o.pose_t) for o in pipe.outputs])
        err = est - (trans - trans[0])
        assert np.isfinite(err).all()
        assert np.abs(err[-1]).max() < 0.2, err
        # segmentation actually reduced the cloud (ground decimation +
        # cluster validity, ref :510-535): map stays far below the raw count
        assert int(pipe.outputs[0].map_points) < n_raw[0] // 2
