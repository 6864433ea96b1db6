"""Typed configuration for the whole framework.

Replaces the reference's ~40 ROS 2 declared parameters + per-dataset YAML
(ref: svn-icp/src/core/OdometryPipeline.cpp:119-276, svn-icp/config/*.yaml)
with strict dataclasses: unknown keys raise, units are converted exactly once
at load, and every jitted function receives plain static fields.

Deliberate divergences from reference quirks (SURVEY.md §7.5):
- the YAML key for accelerometer bias std is `abstd` and is actually read
  (the reference reads `gastd` and silently keeps zeros);
- `use_minibatch`/`batch_size` are honored (reference always forces
  full-batch because `use_minibatch` is never parsed);
- `convergence_steps` is dropped (parsed-but-unused in the reference).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np


@dataclasses.dataclass(frozen=True)
class SteinICPConfig:
    """Hyperparameters of the SVGD/SVN ICP core.

    Mirrors `SteinICPParam` (ref: svn-icp/include/core/SVGDICP.h:41-57) plus
    fixed-shape capacities the TPU build needs (padded cloud sizes).
    """

    # algorithm family: "svn" (Gauss-Newton + Stein), "svgd" (1st order),
    # or "svd" (classic single-/multi-start closed-form Kabsch ICP)
    method: str = "svn"
    # residual model: "point_to_point" (reference behavior) or
    # "point_to_plane" (k-NN plane fit from the stage-1 candidate sets;
    # north-star addition — the reference is point-to-point only)
    residual: str = "point_to_point"
    particle_count: int = 32
    iterations: int = 50
    lr: float = 1.0
    max_dist: float = 2.8            # correspondence gate + M-estimator scale [m]
    knn_count: int = 100             # K candidates per source point (stage-1 KNN)
    candidate_method: str = "bucketed"  # bucketed (group-min) | topk (exact) | voxel (hash buckets)
    voxel_candidate_cap: int = 4     # voxel method: points taken per neighbor voxel
    # per-iteration 1-NN searches only the match_count nearest-at-guess
    # candidates (0 = all knn_count). The in-loop kernel cost scales with
    # the match set; plane normals always fit on the FULL candidate set.
    # Multiple of 8 (Pallas sublane tiling).
    match_count: int = 0
    adaptive_prior: bool = False     # Gaussian re-seed from recent covariances
                                     # (ref variance_prediction, dead at :812-837)
    # MAP prior term (no reference analogue; off = reference behavior): treat
    # the per-frame re-seeded particle box as a Gaussian prior inside the
    # Newton system (H += P^-1, b += P^-1 x with P = box variance). Along
    # unobservable directions the pure-likelihood posterior is IMPROPER —
    # particles diffuse without bound by jitter-amplified repulsion and the
    # reported variance is an arbitrary function of the iteration count; with
    # the prior term the spread converges to the prior variance instead (the
    # honest "nothing learned beyond the prior"), which is also what a KF
    # wants as a measurement covariance in degenerate scenes.
    prior_information: bool = False
    use_pallas: bool = False         # fused Pallas 1-NN kernel (TPU only)
    # fused ensemble-update Pallas kernel (solve + Stein coupling + pose
    # update in one program, kernels/stein_pallas.py). Only active where it
    # applies anyway (use_pallas, P>1, f32, not svn_full_grad); the gate
    # exists for back-to-back A/B measurement (bench.py --no-stein-kernel).
    stein_kernel: bool = True
    pallas_fused_moments: bool = False  # also fuse H/b moment accumulation
                                     # into the kernel (correct but currently
                                     # slower than 1-NN kernel + XLA moments)
    early_stop: bool = True
    convergence_threshold: float = 5e-4
    # early-stop statistic: "grad_norm" = mean per-particle |stein step|
    # (reference criterion, SVNICP.cpp:95-101); "mean_delta" = |drift of the
    # ensemble mean| per iteration. At the Stein equilibrium particles keep
    # jiggling (drive vs repulsion) while the mean is static, so mean_delta
    # converges even when the posterior is wide — the right criterion for
    # point_to_plane, whose softer H sustains a larger equilibrium spread.
    # Applies to method "svn" (single-device and sharded). "svgd" keeps its
    # reference position-difference criterion (SVGDICP.cpp:123-131) and
    # "svd" its mean pose delta — both ignore this field.
    convergence_metric: str = "grad_norm"
    svn_full_grad: bool = False      # full second-order kernel Hessian coupling
    optimizer: str = "adam"          # svgd only: adam | rmsprop | sgd | adagrad
    use_minibatch: bool = False
    batch_size: int = 0              # 0 = full cloud (matches reference behavior)
    normalize: bool = False
    # fixed-shape capacities (TPU build; no reference analogue — dynamic pcl)
    source_capacity: int = 4096      # max source points fed to the ICP core
    target_capacity: int = 65536     # max map points fed to the ICP core
    # particle prior box (ref: OdometryPipeline.cpp:662-665, hard-coded)
    init_lb: tuple[float, ...] = (-0.3, -0.2, -0.1, -0.004, -0.004, -0.012)
    init_ub: tuple[float, ...] = (0.3, 0.2, 0.1, 0.004, 0.004, 0.012)

    def __post_init__(self):
        if self.method not in ("svn", "svgd", "svd"):
            raise ValueError(
                f"method must be 'svn', 'svgd' or 'svd', got {self.method!r}")
        if self.residual not in ("point_to_point", "point_to_plane"):
            raise ValueError(f"unknown residual {self.residual!r}")
        if self.convergence_metric not in ("grad_norm", "mean_delta"):
            raise ValueError(
                f"unknown convergence_metric {self.convergence_metric!r}")
        if self.optimizer.lower() not in ("adam", "rmsprop", "sgd", "adagrad"):
            raise ValueError(f"unknown optimizer {self.optimizer!r}")
        if self.candidate_method not in ("bucketed", "topk", "voxel"):
            raise ValueError(f"unknown candidate_method {self.candidate_method!r}")
        if self.match_count and (self.match_count % 8 or self.match_count < 0):
            raise ValueError(
                f"match_count must be 0 or a positive multiple of 8, "
                f"got {self.match_count}")


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Local voxel map (ref: svn-icp/include/core/VoxelHashMap.h:45-53)."""

    voxel_size: float = 1.0
    max_points_per_voxel: int = 20
    max_range: float = 300.0         # eviction radius around current pose
    capacity: int = 262144           # fixed device table size (points)
    insert_every: int = 1            # insert scans into the map every Nth
                                     # frame (1 = reference behavior; >1
                                     # trades map freshness for throughput —
                                     # off-cadence per-frame dispatches run a
                                     # dedicated no-insert program, skipping
                                     # the map-merge sorts on device; see
                                     # LIOPipeline._skip_insert)
    # BASELINE config-5 operating mode: partition the map into key-range
    # blocks over the mesh point axis (parallel/voxmap_sharded). The live
    # odometry step then inserts into / queries the DISTRIBUTED map (ring
    # candidate gather) instead of replicating it; requires a mesh whose
    # point axis matches cfg.sharding.point_axis, and capacity divisible by
    # that axis. The replicated-map mesh mode (sharded=False) remains the
    # default — the map is tiny next to the point math on small meshes.
    sharded: bool = False
    # frames between occupancy rebalances (0 = never; LIOPipeline cadence).
    # One rebalance ALWAYS runs right after bootstrap when sharded: packed
    # voxel keys of a real scene concentrate in a tiny slice of the key
    # space, so the uniform initial split would put the whole scene in one
    # block and shed its capacity.
    rebalance_every: int = 10
    rebalance_sample: int = 512      # resident-key sample per shard


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Scan preprocessing (ref: OdometryPipeline.cpp:357-447, 675-704)."""

    min_range: float = 0.0
    max_range: float = 80.0
    voxel_size: float = 1.0          # two-stage uniform downsample base size
    deskew: bool = False
    use_segmentation: bool = False
    # run crop + the stage-A uniform downsample on the HOST (native C++,
    # like the reference's CPU PCL preprocessing) instead of on-device: the
    # upload shrinks from the raw scan to one coarse cloud — the remote-
    # tunnel transfer is the measured frame-floor bottleneck. Active unless
    # segmentation is on (needs the raw scan on device); with deskew +
    # per-point timestamps the selected rows' sweep times ride along as a
    # 4th channel and the downsampled cloud is deskewed ON DEVICE
    # (divergence: the raw path deskews BEFORE the downsample selection).
    # The first (bootstrap) frame always ships raw.
    host_downsample: bool = False
    # ship the host-downsampled cloud as int16 on a 2^-8 m (3.9 mm) grid,
    # +/-128 m range — HALVES the per-frame upload, which is bandwidth-bound
    # on remote-tunnel devices (~1.5 ms for 98 KB measured). The ~2 mm RMS
    # quantization noise is far below LiDAR sensor noise; documented
    # divergence from the float pipeline (host_downsample path only).
    quantize_upload: bool = False
    sensor_model: str = "hdl64"      # segmentation scan geometry preset:
                                     # hdl64 | hdl32 | vlp16
    raw_capacity: int = 131072       # padded raw scan size
    # LOAM-style constraint-aware source selection (core/features.py; no
    # reference analogue — built for the measured ring-cloud failure where
    # uniform downsampling of floor-dominated short-range sweeps leaves yaw
    # unconstrained, BASELINE.md round-4 loop-proxy controls). Replaces the
    # two-stage-downsampled SOURCE cloud with per-(ring, sector) edge +
    # planar picks plus a capped scattered ground quota; the map-insert
    # cloud keeps the standard downsample. Needs the raw scan on device
    # (disables the host_downsample fast path, like use_segmentation).
    feature_select: bool = False
    feature_sectors: int = 18        # azimuth sectors per ring (divides
                                     # 2250 and 1800 — all presets)
    feature_edge_per_sector: int = 2
    feature_planar_per_sector: int = 4
    feature_edge_threshold: float = 0.05   # relative curvature
    feature_planar_threshold: float = 0.02
    feature_ground_cap: int = 512   # hash-scattered ground quota
    feature_occlusion_threshold: float = 0.3  # relative neighbor range jump

    def __post_init__(self):
        if self.quantize_upload and self.max_range >= 127.9:
            raise ValueError(
                "quantize_upload uses a 2^-8 m int16 grid covering +/-128 m; "
                f"preprocess.max_range={self.max_range} exceeds it — disable "
                "quantize_upload or reduce max_range below 127.9")
        if self.feature_select and self.use_segmentation:
            raise ValueError(
                "feature_select and use_segmentation are alternative source-"
                "selection stages — enable at most one")


@dataclasses.dataclass(frozen=True)
class IMUNoiseConfig:
    """IMU random-walk parameters, *already converted to SI* at load.

    YAML units match the reference configs: rot_rw [deg/sqrt(hr)],
    vel_rw [m/s/sqrt(hr)], gbstd [deg/hr], abstd [mGal]
    (conversions at ref: OdometryPipeline.cpp:214-225).
    """

    rot_rw: tuple[float, float, float] = (0.0, 0.0, 0.0)    # [rad/sqrt(s)]
    vel_rw: tuple[float, float, float] = (0.0, 0.0, 0.0)    # [m/s/sqrt(s)]
    bg_std: tuple[float, float, float] = (0.0, 0.0, 0.0)    # [rad/s]
    ba_std: tuple[float, float, float] = (0.0, 0.0, 0.0)    # [m/s^2]

    @staticmethod
    def from_yaml_units(rot_rw, vel_rw, gbstd, abstd) -> "IMUNoiseConfig":
        d2r = math.pi / 180.0
        return IMUNoiseConfig(
            rot_rw=tuple(x * d2r / 60.0 for x in rot_rw),
            vel_rw=tuple(x / 60.0 for x in vel_rw),
            bg_std=tuple(x * d2r / 3600.0 for x in gbstd),
            ba_std=tuple(x * 1e-5 for x in abstd),
        )


@dataclasses.dataclass(frozen=True)
class LIOConfig:
    """Estimator-level parameters (ref: OdometryPipeline.cpp:227-263)."""

    estimator: str = "kf"            # "kf" (ESKF fusion) or "icp" (pure odometry)
    init_pos_std: tuple[float, float, float] = (0.05, 0.05, 0.05)
    init_vel_std: tuple[float, float, float] = (0.05, 0.05, 0.05)
    init_rot_std: tuple[float, float, float] = (0.1, 0.1, 0.1)   # [deg] in YAML
    icp_cov_scales: tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    use_const_cov: bool = False
    const_cov: tuple[float, float] = (1e-4, 1e-5)    # (translation, rotation)
    cov_filter: str = "none"         # none | mean | max_sliding_window
    textbook_phi: bool = False       # ESKF velocity->attitude block: textbook
                                     # -skew(R a)dt instead of the reference's
                                     # exp(skew(R a))dt (see core/eskf.py)
    # KF cold-start fix (no reference analogue — the reference shares the
    # weakness, ESEKF.cpp:23-28): the filter initializes v=0 with a tight
    # init_vel_std, so a log that starts mid-motion (any real recording)
    # spends tens of frames dragging the velocity estimate up through the
    # tight prior — measured WORSE than pure ICP on full-speed starts
    # (BASELINE.md). With init_from_motion, the first aligned frame
    # bootstraps the velocity from its own ICP pose delta and resets the
    # velocity covariance block to the implied (ICP-variance-derived)
    # uncertainty; subsequent frames run the normal filter.
    init_from_motion: bool = False
    frame_gap_seconds: float = 0.05
    extrinsic_R: tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)  # row-major lidar->imu
    extrinsic_t: tuple[float, float, float] = (0.0, 0.0, 0.0)

    def __post_init__(self):
        if self.estimator not in ("kf", "icp"):
            raise ValueError(f"estimator must be 'kf' or 'icp', got {self.estimator!r}")
        if self.cov_filter not in ("none", "mean", "max_sliding_window"):
            raise ValueError(f"unknown cov_filter {self.cov_filter!r}")


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    """Keyframe pose-graph / loop closure (north-star addition; the
    reference has no analogue — its trajectory is pure odometry)."""

    enabled: bool = False
    keyframe_trans_threshold: float = 2.0
    keyframe_rot_threshold: float = 0.3      # [rad]
    loop_radius: float = 4.0
    loop_min_separation: int = 20
    optimize_every: int = 10                 # keyframes between optimizations
    loop_max_grad: float = 1e-2              # registration convergence gate
    # loop-verification registration hyperparameters (the SVN ensemble run
    # between keyframe clouds)
    loop_particles: int = 8
    loop_iterations: int = 40
    loop_knn: int = 32
    loop_use_pallas: bool = False
    # edge-information conditioning: the raw ICP particle covariance is
    # overconfident for converged point-to-point runs (measured mean NEES
    # ~88, BASELINE.md), so edges built from it would claim millimetre
    # certainty while carrying decimetre errors and a single bad stretch of
    # odometry would dominate the whole graph. cov_floor adds sigma_floor^2
    # to the diagonal before inversion (default (2 cm)^2); huber_delta is
    # the robust-kernel threshold on the whitened edge norm (Huber weights
    # in the Gauss-Newton loop downweight outlier edges instead of letting
    # them drag the graph; 0 disables).
    cov_floor: float = 4e-4
    huber_delta: float = 3.0
    # apply the optimized correction back to the LIVE estimate: after each
    # optimization the last keyframe's delta rigidly moves the pose history,
    # the ESKF nav state and the voxel map, so loop closures correct future
    # odometry instead of only the side trajectory. Composes with
    # map.sharded: the distributed move re-keys per block and migrates rows
    # to their new owners over the rebalance ring pass
    # (voxmap_sharded.sharded_reanchor).
    reanchor: bool = False
    # sanity bound on a single re-anchor translation [m]: a legitimate loop
    # correction is on the scale of accumulated odometry drift; when
    # odometry is fully LOST, loop registrations can converge in wrong
    # basins and "corrections" grow unbounded — applying one through the
    # rigid map move destroys the state. Non-finite or larger-than-bound
    # corrections are rejected (pipeline.reanchors_rejected counts them).
    max_reanchor_correction: float = 10.0


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Device-mesh layout for multi-chip runs (no reference analogue)."""

    particle_axis: int = 1           # shards of the particle ensemble
    point_axis: int = 1              # shards of the source-point batch


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    icp: SteinICPConfig = dataclasses.field(default_factory=SteinICPConfig)
    map: MapConfig = dataclasses.field(default_factory=MapConfig)
    preprocess: PreprocessConfig = dataclasses.field(default_factory=PreprocessConfig)
    imu: IMUNoiseConfig = dataclasses.field(default_factory=IMUNoiseConfig)
    lio: LIOConfig = dataclasses.field(default_factory=LIOConfig)
    posegraph: PoseGraphConfig = dataclasses.field(default_factory=PoseGraphConfig)
    sharding: ShardingConfig = dataclasses.field(default_factory=ShardingConfig)
    dtype: str = "float32"
    seed: int = 0
    # record the per-iteration particle trajectories [iters,P,6] in every
    # FrameOutput (ref: the save_particles param routing particle_stack_
    # into /svnicp/all_particles, OdometryPipeline.cpp:1019-1023, 966-985).
    # Supported on the single-device "svn" path; the alignment runs all
    # cfg.icp.iterations epochs with post-convergence updates frozen.
    save_particles: bool = False
    # frames per device dispatch (lax.scan inside one jitted call). 1 =
    # live/low-latency mode. >1 amortizes per-program launch overhead —
    # worthwhile on remote-tunnel devices (measured ~5 ms/frame of launch
    # gap on the axon tunnel) and for offline replay/eval; adds
    # (dispatch_batch-1) frames of output latency. Ignored (forced to 1)
    # when the pose graph is enabled, which needs per-frame host decisions.
    dispatch_batch: int = 1
    # overlap host-side scan staging (native crop + downsample, GIL-free)
    # with device dispatch on a single worker thread: feed_scan(k) submits
    # frame k's staging and dispatches frame k-1, adding one frame of output
    # latency. Applies only on the host_downsample fast path with
    # dispatch_batch == 1 and no pose graph; results are bit-identical to
    # the synchronous path (staging is pure, frames dispatch in order).
    stage_ahead: bool = False

    def __post_init__(self):
        if self.save_particles and self.icp.method != "svn":
            raise ValueError(
                "save_particles records the per-iteration particle stack of "
                f"the 'svn' method; got method={self.icp.method!r}")

    @property
    def np_dtype(self):
        return np.dtype(self.dtype)


def _build(cls, data: dict[str, Any], path: str):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise KeyError(f"unknown config key(s) {sorted(unknown)} under '{path}'")
    kwargs = {}
    for name, value in data.items():
        ftype = fields[name].type
        if dataclasses.is_dataclass(_RESOLVED.get(name)) and isinstance(value, dict):
            kwargs[name] = _build(_RESOLVED[name], value, f"{path}.{name}")
        elif isinstance(value, list):
            kwargs[name] = tuple(value)
        else:
            kwargs[name] = value
        del ftype
    return cls(**kwargs)


_RESOLVED = {
    "icp": SteinICPConfig,
    "posegraph": PoseGraphConfig,
    "map": MapConfig,
    "preprocess": PreprocessConfig,
    "imu": IMUNoiseConfig,
    "lio": LIOConfig,
    "sharding": ShardingConfig,
}


def from_dict(data: dict[str, Any]) -> PipelineConfig:
    """Build a PipelineConfig from a nested dict; unknown keys raise."""
    return _build(PipelineConfig, data, "pipeline")


def from_yaml(path: str) -> PipelineConfig:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return from_dict(data)
