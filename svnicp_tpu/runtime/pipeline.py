"""The odometry pipeline: one jitted step per LiDAR frame + a host driver.

TPU-native re-design of the reference's `OdometryPipeline`
(ref: svn-icp/src/core/OdometryPipeline.cpp): the mutable ROS node with 8
mutex-guarded ring buffers and a dedicated ICP thread becomes

- a **pure jitted step** `odometry_step(cfg, state, inputs) -> (state, out)`
  holding the voxel map, ESKF, pose history and smoother rings in one pytree
  (everything the reference kept as members);
- a small **host driver** (`LIOPipeline`) that only does what must stay on
  the host: IMU<->LiDAR timestamp reconciliation (ref: :475-530), frame-gap
  gating (:528), array staging, and record collection.

Per-frame phases mirror §3.3 of SURVEY.md: sync -> preprocess (deskew, crop,
two-stage downsample, :549-560) -> predict (:564) -> fresh particle prior
(:573) -> map query (:576-581) -> SVN align (:598) -> update (ICP compose or
ESKF fusion, :615) -> map insert (:630) -> outputs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.config import PipelineConfig
from svnicp_tpu.core import eskf as eskf_mod
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import imu as imu_mod
from svnicp_tpu.core import pointcloud as pc
from svnicp_tpu.core import smoother
from svnicp_tpu.core import svn
from svnicp_tpu.core import voxmap


class OdometryState(NamedTuple):
    """Everything that persists across frames, as one device pytree."""

    vmap: voxmap.VoxelMap
    eskf: eskf_mod.ESKFState
    pose_r: jax.Array          # [3,3] latest pose (T_{k-1})
    pose_t: jax.Array          # [3]
    prev_r: jax.Array          # [3,3] T_{k-2} (constant-velocity prediction)
    prev_t: jax.Array          # [3]
    pose_time: jax.Array       # scalar: stamp of T_{k-1}
    prev_time: jax.Array       # scalar: stamp of T_{k-2}
    rings: smoother.VarianceRings
    rng: jax.Array             # PRNG key for per-frame particle priors
    frame_idx: jax.Array       # int32
    split_keys: jax.Array      # [S-1] int32 map-block key boundaries when
                               # cfg.map.sharded over S point shards
                               # (parallel/voxmap_sharded); [0] otherwise


class FrameInput(NamedTuple):
    """Host-staged inputs for one frame (fixed shapes)."""

    points: jax.Array          # [Nraw,3] scan in the (extrinsic-compensated) body frame
    valid: jax.Array           # [Nraw]
    timestamps: jax.Array      # [Nraw] per-point time for deskewing (0 if absent)
    time: jax.Array            # scalar frame stamp [s]
    imu: imu_mod.IMUSample     # [W]-batched window covering (t_{k-1}, t_k]
    imu_valid: jax.Array       # [W] bool
    imu_dropped: jax.Array     # scalar int32: oldest samples the host window
                               # could not hold (0 in normal operation)


class FrameOutput(NamedTuple):
    """Per-frame observables (the reference publishes these as 13 topics,
    ref: OdometryPipeline.cpp:89-103; here one structured pytree)."""

    pose_r: jax.Array          # [3,3]
    pose_t: jax.Array          # [3]
    guess_r: jax.Array         # [3,3] prediction before the ICP update
    guess_t: jax.Array
    velocity: jax.Array        # [3]
    particles: jax.Array       # [P,6] final local particles
    weights: jax.Array         # [P]
    var_icp: jax.Array         # [6] raw ICP variance
    var_mean: jax.Array        # [6] mean-window filtered
    var_max_sliding: jax.Array # [6] max-sliding-window filtered (scaled)
    var_random_walk: jax.Array # [6] KF process-noise echo
    cov: jax.Array             # [6,6] full particle covariance
    icp_iterations: jax.Array  # scalar int32
    icp_grad_norm: jax.Array
    align_ok: jax.Array        # scalar bool: alignment produced finite output
    map_points: jax.Array      # scalar int32
    map_dropped: jax.Array     # scalar int32
    target_overflow: jax.Array # scalar int32
    imu_dropped: jax.Array     # scalar int32: IMU samples lost to window overflow
    kf_gain: jax.Array         # [15,6] last ESKF Kalman gain (zeros in icp mode;
                               # ref: /svnicp/kf_gain, OdometryPipeline.cpp:789-795)
    kf_cov_diag: jax.Array     # [15] ESKF covariance diagonal after update
    history: jax.Array         # [H,P,6] per-iteration particle stack; H =
                               # cfg.icp.iterations when cfg.save_particles
                               # (svn, single-device), else 0
                               # (ref: /svnicp/all_particles, :966-985)


def _hist_len(cfg: PipelineConfig) -> int:
    """Static length of FrameOutput.history under this config."""
    return cfg.icp.iterations if cfg.save_particles else 0


# packed frame output + lazy host facade: runtime/packing.py (split out in
# round 5); re-exported here because the wire format is part of the step
# entry points' contract (tests and callers read them via this module)
from svnicp_tpu.runtime.packing import (  # noqa: E402
    _PACK_F32, _PACK_F32_LEN, _PACK_I32, _PACK_OFFSETS,
    HostFrameOutput, PackedFrameOutput, pack_output,
)
from svnicp_tpu.runtime.posegraph_driver import (  # noqa: E402
    PoseGraphDriver, _reanchor_state,
)
from svnicp_tpu.runtime.ingest import IngestDriver  # noqa: E402


def _map_shards(cfg: PipelineConfig) -> int:
    return cfg.sharding.point_axis if cfg.map.sharded else 1


def init_state(cfg: PipelineConfig) -> OdometryState:
    dtype = jnp.dtype(cfg.dtype)
    s = _map_shards(cfg)
    if s > 1:
        from svnicp_tpu.parallel import voxmap_sharded as vms

        if cfg.map.capacity % s:
            raise ValueError(
                f"map.capacity ({cfg.map.capacity}) must divide evenly over "
                f"{s} point shards for map.sharded")
        split_keys = vms.uniform_split_keys(s)
    else:
        split_keys = jnp.zeros((0,), jnp.int32)
    return OdometryState(
        vmap=voxmap.create(cfg.map.capacity, dtype),
        eskf=eskf_mod.create(cfg.lio, cfg.imu, dtype),
        pose_r=jnp.eye(3, dtype=dtype),
        pose_t=jnp.zeros(3, dtype),
        prev_r=jnp.eye(3, dtype=dtype),
        prev_t=jnp.zeros(3, dtype),
        pose_time=jnp.zeros((), dtype),
        prev_time=jnp.zeros((), dtype),
        rings=smoother.create(dtype=dtype),
        rng=jax.random.PRNGKey(cfg.seed),
        frame_idx=jnp.zeros((), jnp.int32),
        split_keys=split_keys,
    )


def _imu_scan_predict(state: eskf_mod.ESKFState, window: imu_mod.IMUSample,
                      valid: jax.Array, noise,
                      textbook_phi: bool = False) -> eskf_mod.ESKFState:
    """Run ESKF predict over a padded IMU window with a lax.scan.

    Each window element is the *finish* sample of one propagation interval;
    the carry holds the previous sample (the reference's imu_previous).
    """

    def body(carry, inp):
        st, prev = carry
        sample, ok = inp
        st_next = eskf_mod.predict(st, prev, sample, noise,
                                   textbook_phi=textbook_phi)
        st = jax.tree.map(lambda a, b: jnp.where(ok, a, b), st_next, st)
        prev = jax.tree.map(lambda a, b: jnp.where(ok, a, b), sample, prev)
        return (st, prev), None

    first = jax.tree.map(lambda a: a[0], window)
    (st, _), _ = jax.lax.scan(body, (state, first), (window, valid))
    return st


def _sensor_model(name: str):
    from svnicp_tpu.core import segmentation as seg

    return {"hdl64": seg.HDL64, "hdl32": seg.HDL32, "vlp16": seg.VLP16}[name]


def _preprocess(cfg: PipelineConfig, state: OdometryState, frame: FrameInput):
    """Segmentation / feature selection + deskew + crop + two-stage
    downsample (ref: OdometryPipeline.cpp:549-560; segmentation runs first,
    at ingest in the reference, :331-345)."""
    pp = cfg.preprocess
    points = frame.points
    sel = None
    if pp.feature_select:
        # LOAM-style constraint-aware SOURCE selection (core/features.py):
        # runs on the raw (skewed) sweep — the range-image structure is the
        # scan pattern itself; selected points carry their sweep times so
        # deskew composes below. The map-insert cloud keeps the standard
        # downsample path (uniform coverage is what the map wants).
        from svnicp_tpu.core import features as feat_mod

        sel = feat_mod.select_features(
            frame.points, frame.valid, frame.timestamps,
            _sensor_model(pp.sensor_model), cfg.icp.source_capacity,
            max_range=pp.max_range, sectors=pp.feature_sectors,
            edge_k=pp.feature_edge_per_sector,
            planar_k=pp.feature_planar_per_sector,
            ground_cap=pp.feature_ground_cap,
            edge_threshold=pp.feature_edge_threshold,
            planar_threshold=pp.feature_planar_threshold,
            occlusion_threshold=pp.feature_occlusion_threshold)
    if pp.use_segmentation:
        from svnicp_tpu.core import segmentation as seg

        if pp.deskew:
            # sweep times ride through the projection (RangeImage.ts), so
            # the reordered segmented cloud keeps aligned per-point times
            # and the deskew below is exact — capability the reference
            # lacks (it segments before deskewing and its deskew reads the
            # original message order)
            segmented, seg_ts = seg.segment_cloud(
                points, frame.valid, _sensor_model(pp.sensor_model),
                pp.raw_capacity, timestamps=frame.timestamps,
            )
            frame = frame._replace(points=segmented.points,
                                   valid=segmented.valid, timestamps=seg_ts)
        else:
            segmented = seg.segment_cloud(
                points, frame.valid, _sensor_model(pp.sensor_model),
                pp.raw_capacity,
            )
            frame = frame._replace(points=segmented.points,
                                   valid=segmented.valid)
        points = frame.points
    if pp.deskew:
        # relative motion of the last two poses (ref: deskew_pointcloud :425-432)
        rd, td = geo.transform_compose(
            *geo.transform_inverse(state.prev_r, state.prev_t), state.pose_r, state.pose_t
        )
        delta_xi = geo.se3_log(rd, td)
        have_hist = state.frame_idx >= 2
        delta_xi = jnp.where(have_hist, delta_xi, jnp.zeros(6, points.dtype))
        points = pc.deskew(points, frame.valid, frame.timestamps, delta_xi)
        if sel is not None:
            sel = sel._replace(points=pc.deskew(
                sel.points, sel.valid, sel.timestamps, delta_xi))

    cropped = pc.crop(pc.PaddedCloud(points, frame.valid),
                      pp.min_range, pp.max_range)
    to_map = pc.downsample_uniform(cropped, 0.5 * pp.voxel_size,
                                   cfg.icp.source_capacity * 2)
    if sel is not None:
        source = pc.crop(pc.PaddedCloud(sel.points, sel.valid),
                         pp.min_range, pp.max_range)
    else:
        source = pc.downsample_uniform(to_map, 1.5 * pp.voxel_size,
                                       cfg.icp.source_capacity)
    return cropped, to_map, source


def _predict_pose(cfg: PipelineConfig, state: OdometryState, time: jax.Array):
    """Initial guess: ESKF pose in KF mode (ref: ESEKF.cpp:68), constant
    velocity extrapolation in ICP mode (ref: OdometryPipeline.cpp:706-737)."""
    if cfg.lio.estimator == "kf":
        return state.eskf.nav.r, state.eskf.nav.t
    rd, td = geo.transform_compose(
        *geo.transform_inverse(state.prev_r, state.prev_t), state.pose_r, state.pose_t
    )
    xi = geo.se3_log(rd, td)
    dt_hist = state.pose_time - state.prev_time
    ratio = jnp.where(dt_hist > 0, (time - state.pose_time) / jnp.maximum(dt_hist, 1e-9), 0.0)
    have_hist = state.frame_idx >= 2
    ri, ti = geo.se3_exp(jnp.where(have_hist, ratio * xi, jnp.zeros_like(xi)))
    return geo.transform_compose(state.pose_r, state.pose_t, ri, ti)


def _map_insert(cfg: PipelineConfig, state: OdometryState, cloud,
                pose_r, pose_t, mesh):
    """Map insert dispatcher: the ordinary device-local insert, or the
    key-range block insert when the map runs sharded over the mesh point
    axis (parallel/voxmap_sharded; BASELINE config 5)."""
    if mesh is not None and cfg.map.sharded:
        from svnicp_tpu.parallel import voxmap_sharded as vms

        return vms.sharded_insert(
            mesh, state.vmap, cloud, pose_r, pose_t,
            cfg.map.voxel_size, cfg.map.max_points_per_voxel,
            cfg.map.max_range, split_keys=state.split_keys,
        )
    return voxmap.insert(
        state.vmap, cloud, pose_r, pose_t,
        cfg.map.voxel_size, cfg.map.max_points_per_voxel, cfg.map.max_range,
    )


def _bootstrap_impl(cfg: PipelineConfig, state: OdometryState, frame: FrameInput,
                    mesh=None):
    """First frame: seed the map at the initial guess, no alignment
    (ref: OdometryPipeline.cpp:583-591)."""
    cropped, _, _ = _preprocess(cfg, state, frame)
    guess_r, guess_t = _predict_pose(cfg, state, frame.time)
    new_map, dropped = _map_insert(cfg, state, cropped, guess_r, guess_t, mesh)
    state = state._replace(
        vmap=new_map,
        prev_r=state.pose_r, prev_t=state.pose_t,
        prev_time=state.pose_time,
        pose_r=guess_r, pose_t=guess_t, pose_time=frame.time,
        frame_idx=state.frame_idx + 1,
    )
    p = cfg.icp.particle_count
    dtype = jnp.dtype(cfg.dtype)
    zero6 = jnp.zeros(6, dtype)
    return state, FrameOutput(
        pose_r=guess_r, pose_t=guess_t, guess_r=guess_r, guess_t=guess_t,
        velocity=state.eskf.nav.v,
        particles=jnp.zeros((p, 6), dtype), weights=jnp.full((p,), 1.0 / p, dtype),
        var_icp=zero6, var_mean=zero6, var_max_sliding=zero6,
        var_random_walk=zero6, cov=1e-4 * jnp.eye(6, dtype=dtype),
        icp_iterations=jnp.zeros((), jnp.int32), icp_grad_norm=jnp.zeros((), dtype),
        align_ok=jnp.ones((), bool),
        map_points=new_map.count().astype(jnp.int32), map_dropped=dropped.astype(jnp.int32),
        target_overflow=jnp.zeros((), jnp.int32),
        imu_dropped=frame.imu_dropped.astype(jnp.int32),
        kf_gain=state.eskf.gain, kf_cov_diag=jnp.diagonal(state.eskf.cov),
        history=jnp.zeros((_hist_len(cfg), p, 6), dtype),
    )


def _odometry_step_impl(
    cfg: PipelineConfig, state: OdometryState, frame: FrameInput, mesh=None,
    pre: tuple | None = None, skip_insert: bool = False,
) -> tuple[OdometryState, FrameOutput]:
    """One LiDAR frame through the full pipeline (SURVEY.md §3.3).

    With `mesh` (a jax.sharding.Mesh with "particle"/"point" axes) the
    registration hot loop runs mesh-parallel via shard_map collectives;
    map/ESKF state stays replicated (tiny next to the point data).
    With `pre` = (to_map, source) the host already cropped+downsampled the
    scan (preprocess.host_downsample) and the device skips _preprocess.
    """
    dtype = jnp.dtype(cfg.dtype)
    hist_on = cfg.save_particles and cfg.icp.method == "svn"
    history = jnp.zeros((0, cfg.icp.particle_count, 6), dtype)

    # --- ESKF propagation over the IMU window (KF mode)
    if cfg.lio.estimator == "kf":
        ekf = _imu_scan_predict(state.eskf, frame.imu, frame.imu_valid, cfg.imu,
                                textbook_phi=cfg.lio.textbook_phi)
        state = state._replace(eskf=ekf)

    # --- preprocess
    if pre is not None:
        to_map, source = pre
    else:
        _, to_map, source = _preprocess(cfg, state, frame)

    # --- predict + fresh particle prior (re-seeded every frame, ref :573)
    guess_r, guess_t = _predict_pose(cfg, state, frame.time)
    rng, sub = jax.random.split(state.rng)
    if cfg.icp.particle_count == 1:
        init_particles = jnp.zeros((1, 6), dtype)
    else:
        lb = jnp.asarray(cfg.icp.init_lb, dtype)
        ub = jnp.asarray(cfg.icp.init_ub, dtype)
        init_particles = lb + (ub - lb) * jax.random.uniform(
            sub, (cfg.icp.particle_count, 6), dtype
        )
        if cfg.icp.adaptive_prior:
            # the reference's (dead) variance_prediction :812-837 made live:
            # once two frames of ICP variance exist, re-seed the prior from a
            # 3-sigma-clamped Gaussian with cov = sum of the last two
            wm = state.rings.mean_ring.shape[0]
            i1 = (state.rings.count - 1) % wm
            i2 = (state.rings.count - 2) % wm
            cov6 = state.rings.mean_ring[i1] + state.rings.mean_ring[i2]
            std = jnp.sqrt(jnp.maximum(cov6, 1e-12))[None, :]
            gauss = jax.random.normal(sub, (cfg.icp.particle_count, 6), dtype) * std
            gauss = jnp.clip(gauss, -3.0 * std, 3.0 * std)
            init_particles = jnp.where(state.rings.count >= 2, gauss, init_particles)

    # --- correspondence + alignment
    if mesh is not None and cfg.map.sharded:
        # BASELINE config-5 operating mode: the voxel map lives as key-range
        # blocks across the mesh point axis; candidates come from a ring
        # ppermute gather over the blocks and the align loop runs mesh-
        # parallel — the map is never replicated or radius-queried
        from svnicp_tpu.parallel import sharding as shp
        from svnicp_tpu.parallel import voxmap_sharded as vms

        if mesh.shape[shp.POINT_AXIS] != cfg.sharding.point_axis:
            raise ValueError(
                f"map.sharded needs mesh point axis == "
                f"cfg.sharding.point_axis ({cfg.sharding.point_axis}), got "
                f"{mesh.shape[shp.POINT_AXIS]}")
        overflow = jnp.zeros((), jnp.int32)
        if hist_on:
            # sharded save_particles: the align loop runs as a scan with a
            # per-iteration particle-axis all_gather (sharding.run_align_loop)
            result, history = vms.sharded_register_with_map(
                mesh, cfg.icp, source.points, source.valid, state.vmap,
                guess_r, guess_t, init_particles, history=True,
            )
        else:
            result = vms.sharded_register_with_map(
                mesh, cfg.icp, source.points, source.valid, state.vmap,
                guess_r, guess_t, init_particles,
            )
        target = None
    elif (cfg.icp.candidate_method == "voxel" and cfg.icp.method == "svn"
            and mesh is None):
        # voxel-hash bucket candidates straight from the sorted-key map:
        # no radius query, no brute-force candidate pass
        overflow = jnp.zeros((), jnp.int32)
        src_world = geo.transform_points(guess_r, guess_t, source.points)
        cand_pts, cand_valid = voxmap.voxel_candidates(
            state.vmap, src_world, source.valid,
            cfg.map.voxel_size, cfg.icp.voxel_candidate_cap,
        )
        if hist_on:
            result, history = svn.align_with_history(
                cfg.icp, source.points, source.valid, cand_pts, cand_valid,
                guess_r, guess_t, init_particles,
            )
        else:
            result = svn.align(
                cfg.icp, source.points, source.valid, cand_pts, cand_valid,
                guess_r, guess_t, init_particles,
            )
        target = None
    else:
        # --- local map query around the guess (ref :576-581; radius
        # divergence documented in voxmap.py — reference effectively used
        # the whole map)
        target, overflow = voxmap.query_radius(
            state.vmap, guess_t, jnp.asarray(cfg.preprocess.max_range + 10.0, dtype),
            cfg.icp.target_capacity,
        )

    # --- SVN/SVGD alignment (mesh-parallel when a device mesh is given)
    if target is None:
        pass
    elif mesh is not None:
        from svnicp_tpu.parallel import sharding

        if hist_on:
            result, history = sharding.sharded_register(
                mesh, cfg.icp, source.points, source.valid,
                target.points, target.valid,
                guess_r, guess_t, init_particles, history=True,
            )
        else:
            result = sharding.sharded_register(
                mesh, cfg.icp, source.points, source.valid,
                target.points, target.valid,
                guess_r, guess_t, init_particles,
            )
    elif cfg.icp.method == "svgd":
        from svnicp_tpu.core import svgd

        rng, mb_key = jax.random.split(rng)
        result = svgd.register(
            cfg.icp, source.points, source.valid, target.points, target.valid,
            guess_r, guess_t, init_particles, rng=mb_key,
        )
    elif cfg.icp.method == "svd":
        from svnicp_tpu.core import icp_svd

        result = icp_svd.register(
            cfg.icp, source.points, source.valid, target.points, target.valid,
            guess_r, guess_t, init_particles,
        )
    elif hist_on:
        result, history = svn.register_with_history(
            cfg.icp, source.points, source.valid, target.points, target.valid,
            guess_r, guess_t, init_particles,
        )
    else:
        result = svn.register(
            cfg.icp, source.points, source.valid, target.points, target.valid,
            guess_r, guess_t, init_particles,
        )

    # --- update
    raw_var = result.var
    scaled_var = raw_var * jnp.asarray(cfg.lio.icp_cov_scales, dtype)

    # failure containment (ref skips the frame on align failure, :599-601):
    # a non-finite ensemble result OR a degenerate correspondence set
    # (grad_norm stays +inf when align skipped the loop — svn._degenerate)
    # falls back to the prediction and leaves the filter, map AND the
    # variance smoother rings untouched (a poisoned ring would corrupt the
    # filtered measurement covariance for the whole following window)
    align_ok = (jnp.isfinite(result.mean).all()
                & jnp.isfinite(result.var).all()
                & jnp.isfinite(result.grad_norm))
    if cfg.icp.method == "svn":
        # runaway containment: a FINAL iteration still moving at the
        # trust-region cap means every particle was clipped — the
        # ensemble was being dragged, not converging (rank-deficient
        # H after the particles left the correspondence gate; since
        # the Cholesky pivot floor such frames produce finite garbage
        # instead of the NaN that used to trip the isfinite check
        # haphazardly). Treat exactly like a non-finite alignment:
        # fall back to the prediction, leave map/filter/rings alone.
        # SVN-only: clip_step bounds the svn mean step norm at max_dist,
        # so grad_norm ~= cap is unambiguous there; svgd's diff_norm is an
        # unclipped optimizer step (can exceed any cap while converging
        # normally) and svd's is a pose delta — neither has this semantic.
        align_ok = align_ok & (result.grad_norm < 0.999 * cfg.icp.max_dist)

    var_mean = smoother.mean_filtered(state.rings)          # excludes current
    pushed = smoother.push(state.rings, raw_var, scaled_var)
    rings = jax.tree.map(lambda a, b: jnp.where(align_ok, a, b),
                         pushed, state.rings)
    var_max = smoother.max_filtered(rings)                  # includes current
    safe_mean = jnp.where(align_ok, result.mean, jnp.zeros(6, dtype))

    # for method "svgd", mean[3:] are ZYX Euler angles but are composed as an
    # axis-angle log — the reference's own tensor2gtsamPose3 conflation,
    # matched deliberately (agrees to O(theta^2); docs/PARITY.md quirk table)
    rc, tc = geo.so3_exp(safe_mean[3:]), safe_mean[:3]
    if cfg.lio.estimator == "icp":
        pose_r, pose_t = geo.transform_compose(guess_r, guess_t, rc, tc)
        ekf = state.eskf
        var_rw = jnp.zeros(6, dtype)
    else:
        use_const = cfg.lio.use_const_cov or cfg.icp.particle_count == 1
        scales = jnp.asarray(cfg.lio.icp_cov_scales, dtype)
        if use_const:
            ct, cr = cfg.lio.const_cov
            meas_cov = jnp.diag(jnp.asarray([ct, ct, ct, cr, cr, cr], dtype))
        elif cfg.lio.cov_filter == "mean":
            # mean ring stores raw variances (the adaptive prior reads it);
            # constant scales commute with the mean, so scale afterwards
            meas_cov = jnp.diag(var_mean * scales)
        elif cfg.lio.cov_filter == "max_sliding_window":
            meas_cov = jnp.diag(var_max)       # max ring stores scaled values
        else:
            # ref scales BEFORE any filtering (OdometryPipeline.cpp:747-748);
            # the unfiltered branch must still apply icp_cov_scales
            meas_cov = jnp.diag(scaled_var)
        ekf_upd = eskf_mod.update(state.eskf, meas_cov, safe_mean)
        ekf = jax.tree.map(
            lambda a, b: jnp.where(align_ok, a, b), ekf_upd, state.eskf
        )
        if cfg.lio.init_from_motion:
            # cold-start bootstrap (lio.init_from_motion): on the FIRST
            # aligned frame, adopt the FULL ICP-composed pose (the Kalman
            # update discounts the innovation by gain < 1, so a full-speed
            # start's large first correction is only partially absorbed —
            # and the velocity derived from the under-corrected pose stays
            # low for tens of frames), set the velocity to that pose's
            # delta over the frame gap, and reset the velocity covariance
            # rows/cols to the implied uncertainty (2x the ICP translation
            # variance over dt^2 — two poses contribute). An explicit
            # initialization step, not a Kalman update: before the filter
            # has a velocity, the ICP pose IS the best state estimate.
            dt_f = jnp.maximum(frame.time - state.pose_time,
                               jnp.asarray(1e-3, dtype))
            full_r, full_t = geo.transform_compose(guess_r, guess_t, rc, tc)
            v_boot = (full_t - state.pose_t) / dt_f
            vel_var = 2.0 * jnp.maximum(raw_var[:3], 1e-6) / (dt_f * dt_f)
            cov_b = ekf.cov.at[3:6, :].set(0.0).at[:, 3:6].set(0.0)
            cov_b = cov_b.at[3:6, 3:6].set(jnp.diag(vel_var))
            # adaptive trigger: only fire when the first correction shows
            # one-frame motion OUTSIDE the velocity prior's 3-sigma — a
            # from-rest start (v=0 is the truth) keeps the plain filter,
            # which measured slightly better there (the one-frame velocity
            # estimate is noisier than a correct zero prior)
            unmodeled = jnp.linalg.norm(tc) > 3.0 * dt_f * jnp.linalg.norm(
                jnp.asarray(cfg.lio.init_vel_std, dtype))
            boot = (state.frame_idx == 1) & align_ok & unmodeled
            ekf = jax.tree.map(
                lambda a, b: jnp.where(boot, a, b),
                ekf._replace(
                    nav=imu_mod.NavState(full_r, full_t, v_boot),
                    cov=cov_b), ekf)
        pose_r, pose_t = ekf.nav.r, ekf.nav.t
        var_rw = eskf_mod.random_walk_variance(ekf)

    # --- map update (finer cloud, ref :630); optionally decimated in time;
    # skipped entirely when alignment failed (pose would be the raw guess).
    # skip_insert is a STATIC specialization chosen by the host cadence
    # (LIOPipeline dispatches a no-insert program on off-cadence frames, so
    # the map-merge sorts are skipped entirely — a lax.cond would pay its
    # ~0.3 ms branch overhead every frame and block fusion); the traced
    # frame_idx predicate below remains for the lax.scan batch path, where
    # the per-frame decision must live in-graph.
    if skip_insert:
        new_map = state.vmap
        dropped = jnp.zeros((), jnp.int32)
    elif cfg.map.insert_every > 1:
        do_insert = align_ok & (state.frame_idx % cfg.map.insert_every == 0)
        inserted, dropped_i = _map_insert(cfg, state, to_map, pose_r, pose_t, mesh)
        new_map = jax.tree.map(
            lambda a, b: jnp.where(do_insert, a, b), inserted, state.vmap
        )
        dropped = jnp.where(do_insert, dropped_i, 0)
    else:
        inserted, dropped_i = _map_insert(cfg, state, to_map, pose_r, pose_t, mesh)
        new_map = jax.tree.map(
            lambda a, b: jnp.where(align_ok, a, b), inserted, state.vmap
        )
        dropped = jnp.where(align_ok, dropped_i, 0)

    new_state = OdometryState(
        vmap=new_map,
        eskf=ekf,
        pose_r=pose_r, pose_t=pose_t,
        prev_r=state.pose_r, prev_t=state.pose_t,
        pose_time=frame.time, prev_time=state.pose_time,
        rings=rings,
        rng=rng,
        frame_idx=state.frame_idx + 1,
        split_keys=state.split_keys,
    )
    out = FrameOutput(
        pose_r=pose_r, pose_t=pose_t, guess_r=guess_r, guess_t=guess_t,
        velocity=ekf.nav.v,
        particles=result.particles, weights=result.weights,
        var_icp=raw_var, var_mean=var_mean, var_max_sliding=var_max,
        var_random_walk=var_rw, cov=result.cov,
        icp_iterations=result.iterations, icp_grad_norm=result.grad_norm,
        align_ok=align_ok,
        map_points=new_map.count().astype(jnp.int32),
        map_dropped=dropped.astype(jnp.int32),
        target_overflow=overflow.astype(jnp.int32),
        imu_dropped=frame.imu_dropped.astype(jnp.int32),
        kf_gain=ekf.gain, kf_cov_diag=jnp.diagonal(ekf.cov),
        history=history,
    )
    return new_state, out


# public jitted entry points (FrameInput pytree arguments)
bootstrap_frame = functools.partial(jax.jit, static_argnames=("cfg", "mesh"))(
    _bootstrap_impl
)
odometry_step = functools.partial(jax.jit, static_argnames=("cfg", "mesh"))(
    _odometry_step_impl
)


def _unpack_frame(cfg: PipelineConfig, scan_buf: jax.Array, imu_buf: jax.Array,
                  meta: jax.Array) -> FrameInput:
    """Rebuild a FrameInput from the packed host buffers (see
    `LIOPipeline._pack_frame`): scan_buf [cap,4] = xyz + per-point time,
    imu_buf [W,7] = dt + acc + gyro, meta [4] f64 = (stamp, n_points, n_imu,
    n_imu_dropped). Validity masks are prefix masks from the counts."""
    dtype = jnp.dtype(cfg.dtype)
    if scan_buf.dtype == jnp.int16:
        # quantized raw upload (preprocess.quantize_upload on the raw
        # path): 2^-8 m grid, +/-128 m; the ts channel shares the grid
        scan_buf = scan_buf.astype(dtype) * (2.0 ** -8)
    cap = scan_buf.shape[0]
    w = imu_buf.shape[0]
    n_pts = meta[1].astype(jnp.int32)
    n_imu = meta[2].astype(jnp.int32)
    return FrameInput(
        points=scan_buf[:, :3],
        valid=jnp.arange(cap, dtype=jnp.int32) < n_pts,
        timestamps=scan_buf[:, 3],
        time=meta[0].astype(dtype),
        imu=imu_mod.IMUSample(imu_buf[:, 0], imu_buf[:, 1:4], imu_buf[:, 4:7]),
        imu_valid=jnp.arange(w, dtype=jnp.int32) < n_imu,
        imu_dropped=meta[3].astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1,))
def bootstrap_packed(cfg: PipelineConfig, state: OdometryState,
                     scan_buf: jax.Array, imu_buf: jax.Array, meta: jax.Array,
                     mesh=None):
    state, out = _bootstrap_impl(
        cfg, state, _unpack_frame(cfg, scan_buf, imu_buf, meta), mesh=mesh)
    return state, pack_output(out)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "skip_insert"), donate_argnums=(1,))
def odometry_step_packed(cfg: PipelineConfig, state: OdometryState,
                         scan_buf: jax.Array, imu_buf: jax.Array, meta: jax.Array,
                         mesh=None, skip_insert: bool = False):
    """`odometry_step` over packed buffers: the host driver ships THREE
    arrays per frame instead of the 8-leaf FrameInput pytree. Each jit
    argument is a separate host->device transfer, and on a remote-tunnel
    device every transfer pays dispatch latency — packing recovers most of
    the ~9 ms/frame the 8 transfers cost at bench shapes.

    skip_insert selects the no-map-insert specialization (host insert
    cadence, map.insert_every — see _odometry_step_impl).

    donate_argnums=(1,): the state is consumed linearly by the host driver
    (self.state is always reassigned from the return), so donating it lets
    XLA alias unchanged state leaves input->output instead of copying them.
    A device trace showed those pass-through copies (pose, smoother rings,
    ESKF gain/cov — tiny arrays) costing 3.1 ms/frame, 41% of device time,
    on the remote-tunnel backend. Do NOT call these *_packed entry points
    twice with the same state object (tests use odometry_step, which does
    not donate).

    Returns (state, PackedFrameOutput): the small observables fused into
    two buffers (see pack_output — ~19 tiny per-frame output buffers cost
    2.18 ms/frame of fixed per-buffer copy overhead on the tunnel)."""
    state, out = _odometry_step_impl(
        cfg, state, _unpack_frame(cfg, scan_buf, imu_buf, meta),
        mesh=mesh, skip_insert=skip_insert)
    return state, pack_output(out)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "skip_insert"), donate_argnums=(1,))
def odometry_step_packed_pre(cfg: PipelineConfig, state: OdometryState,
                             ds_buf: jax.Array, imu_buf: jax.Array,
                             meta: jax.Array, mesh=None,
                             skip_insert: bool = False):
    """`odometry_step` over a HOST-preprocessed cloud: ds_buf [2*src_cap,3]
    = the stage-A (0.5*voxel) to_map rows (zero-padded), meta [4] f64 =
    (stamp, n_map, n_imu, n_imu_dropped). The stage-B source cloud is DERIVED on device
    (downsample of to_map — identical selection to the host/native stage B,
    three-way tested), so the per-frame upload ships only the coarse cloud:
    the tunnel transfer is the frame-floor bottleneck (see
    preprocess.host_downsample).

    With preprocess.deskew and per-point timestamps, ds_buf is [2*src_cap,4]
    (xyz + normalized sweep time of the SELECTED rows) and the downsampled
    cloud is deskewed ON DEVICE with the last relative motion before stage B
    — documented divergence from the raw path, which deskews BEFORE the
    downsample selection (the selection itself sees skewed points; at LiDAR
    motion scales the voxel assignments barely differ)."""
    from svnicp_tpu.core import pointcloud as pc
    from svnicp_tpu.core.pointcloud import PaddedCloud

    dtype = jnp.dtype(cfg.dtype)
    map_cap = 2 * cfg.icp.source_capacity
    src_cap = cfg.icp.source_capacity
    w = imu_buf.shape[0]
    n_map = meta[1].astype(jnp.int32)
    n_imu = meta[2].astype(jnp.int32)
    if ds_buf.dtype == jnp.int16:
        # quantized upload (preprocess.quantize_upload): 2^-8 m grid
        # (channel 3, when present, is the normalized sweep time — the same
        # grid gives ~0.4% of a sweep resolution)
        ds_buf = ds_buf.astype(dtype) * (2.0 ** -8)
    to_map = PaddedCloud(ds_buf[:map_cap, :3],
                         jnp.arange(map_cap, dtype=jnp.int32) < n_map)
    if cfg.preprocess.deskew and ds_buf.shape[1] == 4:
        rd, td = geo.transform_compose(
            *geo.transform_inverse(state.prev_r, state.prev_t),
            state.pose_r, state.pose_t)
        delta_xi = geo.se3_log(rd, td)
        delta_xi = jnp.where(state.frame_idx >= 2, delta_xi,
                             jnp.zeros(6, dtype))
        pts = pc.deskew(to_map.points, to_map.valid, ds_buf[:map_cap, 3],
                        delta_xi)
        to_map = PaddedCloud(pts, to_map.valid)
    source = pc.downsample_uniform(to_map, 1.5 * cfg.preprocess.voxel_size,
                                   src_cap)
    frame = FrameInput(
        points=source.points,
        valid=source.valid,
        timestamps=jnp.zeros((src_cap,), dtype),
        time=meta[0].astype(dtype),
        imu=imu_mod.IMUSample(imu_buf[:, 0], imu_buf[:, 1:4], imu_buf[:, 4:7]),
        imu_valid=jnp.arange(w, dtype=jnp.int32) < n_imu,
        imu_dropped=meta[3].astype(jnp.int32),
    )
    state, out = _odometry_step_impl(cfg, state, frame, mesh=mesh,
                                     pre=(to_map, source),
                                     skip_insert=skip_insert)
    return state, pack_output(out)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(1,))
def odometry_steps_packed(cfg: PipelineConfig, state: OdometryState,
                          scan_bufs: jax.Array, imu_bufs: jax.Array,
                          metas: jax.Array, mesh=None):
    """`odometry_step_packed` over a [F,...] batch of staged frames as one
    jitted lax.scan — ONE program launch for F frames (see
    PipelineConfig.dispatch_batch; measured slower than per-frame dispatch
    on the axon tunnel, kept for backends with costly launches).
    Returns (final state, PackedFrameOutput pytree with a leading F axis)."""

    def body(st, inp):
        sb, ib, mb = inp
        st, out = _odometry_step_impl(cfg, st, _unpack_frame(cfg, sb, ib, mb),
                                      mesh=mesh)
        return st, pack_output(out)

    return jax.lax.scan(body, state, (scan_bufs, imu_bufs, metas))


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def odometry_steps_packed_pre(cfg: PipelineConfig, state: OdometryState,
                              ds_bufs: jax.Array, imu_bufs: jax.Array,
                              metas: jax.Array, mesh=None):
    """Batched form of `odometry_step_packed_pre` (host-preprocessed
    frames), so dispatch_batch and preprocess.host_downsample compose."""

    def body(st, inp):
        db, ib, mb = inp
        return odometry_step_packed_pre(cfg, st, db, ib, mb, mesh=mesh)

    return jax.lax.scan(body, state, (ds_bufs, imu_bufs, metas))


@dataclasses.dataclass
class LIOPipeline(IngestDriver, PoseGraphDriver):
    """Host driver: sensor feeds, IMU<->LiDAR sync, frame staging.

    Replaces the reference's callback threads + `ICP_processing` worker
    (ref: OdometryPipeline.cpp:106-110, 449-658). The sync rules are the
    reference's, expressed over host queues:
    - scans older than the last processed frame + frame_gap are skipped;
    - the IMU window handed to the device covers (t_prev, t_frame], with a
      linear interpolation sample synthesized at the frame stamp when it
      falls between two IMU samples (ref: :502-513).
    """

    cfg: PipelineConfig
    imu_window: int = 256

    def __post_init__(self):
        sh = self.cfg.sharding
        self.mesh = None
        if sh.particle_axis * sh.point_axis > 1:
            from svnicp_tpu.parallel import sharding as shp

            if self.cfg.icp.particle_count % sh.particle_axis:
                raise ValueError(
                    f"particle_count ({self.cfg.icp.particle_count}) must "
                    f"divide over {sh.particle_axis} particle shards")
            if self.cfg.icp.source_capacity % sh.point_axis:
                raise ValueError(
                    f"source_capacity ({self.cfg.icp.source_capacity}) must "
                    f"divide over {sh.point_axis} point shards")
            self.mesh = shp.make_mesh(sh.particle_axis, sh.point_axis)
        elif self.cfg.map.sharded:
            raise ValueError(
                "map.sharded needs a device mesh: set sharding.point_axis "
                "(and optionally particle_axis) > 1")
        # multi-process runtime (parallel/distributed.py): when the mesh
        # spans processes, host-staged buffers and the persistent state
        # must be globally-replicated jax.Arrays — every process stages
        # the same frame (SPMD scan-broadcast) and jit consumes the global
        # arrays with the mesh collectives inside
        self._replicated = None
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            self._replicated = NamedSharding(self.mesh, PartitionSpec())
        self.rebalance_drops = 0
        self.rebalances = 0
        # reanchor-specific shard-overflow drops (sharded map only): the
        # replicated _reanchor_state move never drops rows, so a nonzero
        # value here flags parity loss on the sharded path specifically —
        # folded into rebalance_drops it would be indistinguishable from
        # routine rebalance truncation
        self.reanchor_drops = 0
        self.state = init_state(self.cfg)
        if self._replicated is not None:
            self.state = jax.tree.map(
                lambda a: jax.device_put(a, self._replicated), self.state)
        self._imu_times: list[float] = []
        self._imu_samples: list[tuple[float, np.ndarray, np.ndarray]] = []
        self._last_frame_time: float | None = None
        self._last_imu_time: float | None = None
        self._frames = 0
        self.outputs: list[FrameOutput] = []
        self.times: list[float] = []
        self.imu_dropped_total = 0
        from svnicp_tpu.runtime.profiling import StageTimer

        # per-stage wall clocks; frame_timings[i] pairs with outputs[i]:
        # {"preprocessing_time": host staging [s], "steinicp_time": device
        #  dispatch [s] (async — add a sync span for end-to-end, see cli.py)}
        self.timer = StageTimer()
        self.frame_timings: list[dict] = []
        self.posegraph = None
        self._batch: list = []
        self._batch_kind: str = "raw"
        self._stage_pool = None
        self._pending: list = []    # [(t, future)] staged-ahead frames
        self._keyframe_clouds: list[tuple[np.ndarray, np.ndarray]] = []
        self.loop_closures: list[tuple[int, int]] = []
        self.reanchors = 0
        self.reanchors_rejected = 0
        self.loop_edges_pruned = 0
        if self.cfg.posegraph.enabled:
            from svnicp_tpu.runtime.posegraph import PoseGraph

            pg = self.cfg.posegraph
            self.posegraph = PoseGraph(
                keyframe_trans_threshold=pg.keyframe_trans_threshold,
                keyframe_rot_threshold=pg.keyframe_rot_threshold,
                loop_radius=pg.loop_radius,
                loop_min_separation=pg.loop_min_separation,
                cov_floor=pg.cov_floor,
                huber_delta=pg.huber_delta,
            )

    def feed_scan(self, t: float, points: np.ndarray, timestamps=None) -> FrameOutput | None:
        """Process one LiDAR scan; returns the frame output (or None when the
        frame-gap gate drops it, ref: OdometryPipeline.cpp:528).

        With cfg.dispatch_batch > 1 (and no pose graph), frames after the
        bootstrap are buffered and dispatched dispatch_batch-at-a-time as one
        lax.scan program (see odometry_steps_packed); returns None until a
        batch flushes, then the batch's last output. Call `flush()` before
        reading `trajectory()`/`outputs` to drain a partial batch.
        """
        if self._last_frame_time is not None and (
            t - self._last_frame_time < self.cfg.lio.frame_gap_seconds
        ):
            return None
        pp = self.cfg.preprocess
        # fast path applies when segmentation is off: plain when no
        # timestamps are in play, ts-carrying when deskew is on and
        # per-point times are given (device-side deskew of the downsampled
        # cloud — see odometry_step_packed_pre). Timestamps WITHOUT deskew
        # keep the raw path (ts would be silently dropped otherwise).
        host_ds = (pp.host_downsample and not pp.use_segmentation
                   and not pp.feature_select and self._frames > 0
                   and (timestamps is None or pp.deskew))
        ds_ts = timestamps if (host_ds and pp.deskew) else None
        batch_n = self.cfg.dispatch_batch if self.posegraph is None else 1
        if self._frames == 0:
            scan_buf, imu_buf, meta = self._pack_frame(t, points, timestamps)
            with self.timer.span("dispatch"):
                self.state, out = bootstrap_packed(
                    self.cfg, self.state,
                    *self._put((scan_buf, imu_buf, meta)), mesh=self.mesh)
            out = HostFrameOutput(out)
            self._record_frame(t, out, points)
            self._maybe_rebalance(force=True)
            return out

        if (host_ds and batch_n == 1 and self.cfg.stage_ahead
                and self.posegraph is None):
            # (pose graph excluded: it needs per-frame host decisions on the
            # CURRENT frame's output, incompatible with 1-frame latency)
            return self._feed_scan_ahead(t, points, ds_ts)
        if self._pending:
            self.flush()    # staging mode changed mid-stream: keep order
        kind = "pre" if host_ds else "raw"
        bufs = (self._pack_frame_pre(t, points, ds_ts) if host_ds
                else self._pack_frame(t, points, timestamps))
        if batch_n > 1:
            if self._batch and self._batch_kind != kind:
                self.flush()     # staging layout changed mid-stream
            self._batch_kind = kind
            self._frames += 1
            self._last_frame_time = t
            self._batch.append((*bufs, t))
            if len(self._batch) < batch_n:
                return None
            return self._flush_batch()
        step = odometry_step_packed_pre if host_ds else odometry_step_packed
        with self.timer.span("dispatch"):
            self.state, out = step(self.cfg, self.state, *self._put(bufs),
                                   mesh=self.mesh,
                                   skip_insert=self._skip_insert(self._frames))
        out = HostFrameOutput(out)
        self._record_frame(t, out, points)
        return out

    def _put(self, bufs):
        """Multi-process staging: lift host buffers to globally-replicated
        arrays (identical data staged by every process); no-op otherwise."""
        if self._replicated is None:
            return bufs
        return tuple(jax.device_put(np.asarray(b), self._replicated)
                     for b in bufs)

    def _skip_insert(self, frame_idx: int) -> bool:
        """Host insert cadence (map.insert_every): off-cadence frames
        dispatch the no-insert step specialization, skipping the map-merge
        sorts on device entirely. frame_idx mirrors the device
        state.frame_idx (both count processed frames incl. bootstrap), so
        this matches the in-graph predicate the batch path uses."""
        n = self.cfg.map.insert_every
        return n > 1 and frame_idx % n != 0

    def _record_frame(self, t: float, out: FrameOutput, points) -> None:
        self._frames += 1
        self._last_frame_time = t
        self.outputs.append(out)
        self.times.append(t)
        self.frame_timings.append({
            "preprocessing_time": self.timer.last.get("preprocess", 0.0),
            "steinicp_time": self.timer.last.get("dispatch", 0.0),
        })
        self._maybe_rebalance()
        if self.posegraph is not None:
            self._update_posegraph(t, out, points)

    def _maybe_rebalance(self, force: bool = False) -> None:
        """Sharded-map occupancy rebalance every map.rebalance_every frames
        (host cadence; the pass is an identity below the imbalance
        threshold — see voxmap_sharded.rebalance). `force` bypasses the
        cadence: the post-bootstrap rebalance must always run because the
        uniform initial key split concentrates the scene in one block."""
        if self.mesh is None or not self.cfg.map.sharded:
            return
        k = self.cfg.map.rebalance_every
        if not force and (k <= 0 or len(self.outputs) % k):
            return
        from svnicp_tpu.parallel import voxmap_sharded as vms

        new_map, new_splits, dropped = vms.rebalance(
            self.mesh, self.state.vmap, self.state.split_keys,
            sample_per_shard=self.cfg.map.rebalance_sample)
        self.state = self.state._replace(vmap=new_map, split_keys=new_splits)
        self.rebalance_drops += int(dropped)
        self.rebalances += 1

    def _flush_batch(self) -> FrameOutput | None:
        """Dispatch the buffered frames as one scan program and unstack."""
        if not self._batch:
            return None
        items = self._batch
        self._batch = []
        step = (odometry_step_packed_pre if self._batch_kind == "pre"
                else odometry_step_packed)
        steps = (odometry_steps_packed_pre if self._batch_kind == "pre"
                 else odometry_steps_packed)
        if len(items) == 1:
            # avoid a distinct scan-length compilation for a lone remainder
            b0, b1, b2, t = items[0]
            with self.timer.span("dispatch"):
                self.state, out = step(self.cfg, self.state,
                                       *self._put((b0, b1, b2)),
                                       mesh=self.mesh)
            out = HostFrameOutput(out)
            self.outputs.append(out)
            self.times.append(t)
            self.frame_timings.append({
                "preprocessing_time": 0.0,
                "steinicp_time": self.timer.last.get("dispatch", 0.0),
            })
            return out
        stacked = self._put([np.stack([it[i] for it in items])
                             for i in range(3)])
        with self.timer.span("dispatch"):
            self.state, outs = steps(self.cfg, self.state, *stacked,
                                     mesh=self.mesh)
        # batched dispatch has no per-frame split: amortize the batch wall
        per_frame = self.timer.last.get("dispatch", 0.0) / len(items)
        last = None
        for i, it in enumerate(items):
            last = HostFrameOutput(jax.tree.map(lambda a, i=i: a[i], outs))
            self.outputs.append(last)
            self.times.append(it[3])
            self.frame_timings.append(
                {"preprocessing_time": 0.0, "steinicp_time": per_frame})
        return last

    def flush(self) -> FrameOutput | None:
        """Drain a partially-filled dispatch batch and any staged-ahead
        frames (no-op in plain live mode). Returns the last frame's output,
        or None if nothing was pending."""
        step = (odometry_step_packed_pre if self._batch_kind == "pre"
                else odometry_step_packed)
        last = None
        while self._pending:
            last = self._dispatch_pending()
        while self._batch:
            # drain one-by-one: a partial batch has a different scan length,
            # and per-frame dispatch avoids compiling a program per length
            b0, b1, b2, t = self._batch.pop(0)
            with self.timer.span("dispatch"):
                self.state, out = step(self.cfg, self.state,
                                       *self._put((b0, b1, b2)),
                                       mesh=self.mesh)
            out = HostFrameOutput(out)
            self.outputs.append(out)
            self.times.append(t)
            self.frame_timings.append({
                "preprocessing_time": 0.0,
                "steinicp_time": self.timer.last.get("dispatch", 0.0),
            })
            last = out
        return last

    def close(self) -> None:
        """Drain pending work and stop the stage-ahead worker thread."""
        self.flush()
        if self._stage_pool is not None:
            self._stage_pool.shutdown(wait=True)
            self._stage_pool = None

    def __del__(self):
        pool = getattr(self, "_stage_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)

    def trajectory(self) -> np.ndarray:
        """[N,4,4] homogeneous poses of all processed frames."""
        mats = []
        for o in self.outputs:
            m = np.eye(4)
            m[:3, :3] = np.asarray(o.pose_r)
            m[:3, 3] = np.asarray(o.pose_t)
            mats.append(m)
        return np.stack(mats) if mats else np.zeros((0, 4, 4))
