"""Ring-cloud loop-proxy study (round 5, VERDICT item 1).

Round 4 isolated the capped-range loop proxy's divergence to cloud
STRUCTURE: 9 m-capped raycast sweeps are 76% floor, ring-patterned, and the
two-stage downsample leaves ~355 source points — yaw is near-unconstrained
and base odometry drifts -0.015 rad/frame from frame 1 (BASELINE.md
"Negative result — loop closure on the capped-range proxy"). This harness
measures the candidate fixes on the SAME scenario:

  base     the round-4 operating point (configs/proxy_hdl64.yaml) — the
           reproduction row
  base-icp pure-ICP estimator control (no KF cold-start confound)
  seg      the reference's own tool for floor-dominated clouds: range-image
           ground removal + cluster purity (core/segmentation.py; ref
           ImageProjection.h:329-377, 435-531) + the MAP prior (required:
           segmented thin-wall clouds have no vertical normals)
  feat     range-image feature selection (core/features.py): LOAM-style
           per-sector edge/planar picks with a ground quota

Usage: python tools/loop_study.py [--variants base,seg,...] [--frames 246]
Each run prints one JSON line; results belong in BASELINE.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def record_loop(frames: int, scan_range: float, loop_radius: float,
                seed: int) -> tuple[str, str]:
    """Record (once, cached) the capped-range loop log; returns (log, gt)."""
    from svnicp_tpu.io import stream as stream_mod

    key = hashlib.sha1(
        f"loop5 {frames} {scan_range} {loop_radius} {seed}".encode()
    ).hexdigest()[:12]
    log = f"/tmp/loop_proxy_{key}.svnl"
    gtp = f"/tmp/loop_proxy_{key}_gt.npy"
    if not (os.path.exists(log) and os.path.exists(gtp)):
        t0 = time.perf_counter()
        gt = stream_mod.record_proxy(
            log, n_frames=frames, path_shape="loop",
            loop_radius=loop_radius, scan_range=scan_range, seed=seed)
        np.save(gtp, gt)
        print(f"[loop_study] recorded {frames} frames in "
              f"{time.perf_counter() - t0:.1f}s -> {log}", file=sys.stderr)
    return log, gtp


def variant_config(name: str):
    from svnicp_tpu import config as cfg_mod

    cfg = cfg_mod.from_yaml(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "proxy_hdl64.yaml"))
    if name == "base":
        return cfg
    if name == "base-icp":
        return dataclasses.replace(
            cfg, lio=dataclasses.replace(cfg.lio, estimator="icp"))
    if name == "seg":
        # deskew stays ON: sweep times ride through the projection
        # (RangeImage.ts carry, round 5), so the reordered segmented cloud
        # deskews exactly — the sweeps are genuinely distorted
        return dataclasses.replace(
            cfg,
            lio=dataclasses.replace(cfg.lio, estimator="icp"),
            preprocess=dataclasses.replace(
                cfg.preprocess, use_segmentation=True),
            icp=dataclasses.replace(cfg.icp, prior_information=True),
        )
    if name == "feat":
        return dataclasses.replace(
            cfg,
            lio=dataclasses.replace(cfg.lio, estimator="icp"),
            preprocess=dataclasses.replace(
                cfg.preprocess, feature_select=True),
            icp=dataclasses.replace(cfg.icp, prior_information=True),
        )
    if name == "feat-kf":
        # the full designed stack: feature selection + ESKF fusion (the
        # gyro carries heading where the ring clouds cannot: bias 0.001
        # rad/s integrates to ~0.025 rad over the whole loop vs the pure-
        # ICP -0.5 rad) + the cold-start bootstrap (the loop starts at
        # full speed) + the MAP prior (honest ICP variance along the
        # unobservable dims, so the filter discounts ICP yaw correctly)
        return dataclasses.replace(
            cfg,
            lio=dataclasses.replace(cfg.lio, init_from_motion=True),
            preprocess=dataclasses.replace(
                cfg.preprocess, feature_select=True),
            icp=dataclasses.replace(cfg.icp, prior_information=True),
        )
    if name.endswith("-plane"):
        # point-to-plane on the feature/segmented clouds: the selected
        # source samples surfaces DIFFERENTLY from the uniformly-downsampled
        # map, so nearest-POINT matching carries a systematic sampling bias
        # (~voxel/2 scale) that integrates into translation drift; the
        # plane residual measures distance to the SURFACE instead (normals
        # fit from the K-candidate neighborhoods, K=32 per the flagship
        # operating point)
        base = variant_config(name[: -len("-plane")])
        return dataclasses.replace(
            base,
            icp=dataclasses.replace(
                base.icp, residual="point_to_plane", knn_count=32,
                convergence_metric="mean_delta",
                convergence_threshold=1e-3),
        )
    raise SystemExit(f"unknown variant {name!r}")


def run_variant(name: str, log: str, gtp: str, posegraph: bool = False):
    import jax.numpy as jnp

    from svnicp_tpu.core import geometry as geo
    from svnicp_tpu.io import metrics
    from svnicp_tpu.io import stream as stream_mod
    from svnicp_tpu.runtime import pipeline as pl

    cfg = variant_config(name)
    if posegraph:
        # sized for the 246-frame circle: ~37.7 m circumference at 1.5 m
        # keyframe spacing gives ~25 keyframes, so the separation gate must
        # sit well below that; candidate radius 4.0 covers the measured
        # ~2.2-2.4 m tail error of the feat-kf-plane base odometry
        cfg = dataclasses.replace(
            cfg, posegraph=dataclasses.replace(
                cfg.posegraph, enabled=True, reanchor=True,
                keyframe_trans_threshold=1.5, loop_min_separation=12,
                loop_radius=4.0, loop_iterations=60, loop_knn=32,
                loop_use_pallas=True))
    gt = np.load(gtp)
    pipe = pl.LIOPipeline(cfg)
    t0 = time.perf_counter()
    with open(log, "rb") as f:
        n = stream_mod.play(pipe, f)
    pipe.close()
    wall = time.perf_counter() - t0
    est = pipe.trajectory()
    rec = {"variant": name, "frames": n,
           "fps": round(n / wall, 2)}
    if len(est) == len(gt):
        rec["ate_rmse_m"] = round(metrics.ate_rmse(est, gt), 4)
        # final drift + per-frame yaw error trend (the round-4 failure mode)
        err_t = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
        rec["final_pos_err_m"] = round(float(err_t[-1]), 3)
        rec["max_pos_err_m"] = round(float(err_t.max()), 3)
        yaw_err = []
        for i in range(len(est)):
            dr = est[i, :3, :3] @ gt[i, :3, :3].T
            yaw_err.append(float(np.asarray(
                geo.so3_log(jnp.asarray(dr, jnp.float64)))[2]))
        rec["final_yaw_err_rad"] = round(yaw_err[-1], 4)
        rec["yaw_drift_rad_per_frame"] = round(
            float(np.polyfit(np.arange(len(yaw_err)), yaw_err, 1)[0]), 5)
        # loop-gate viability: when the trajectory re-enters the start
        # region (last 10% of frames), is the estimate within the 2.5 m
        # loop-candidate gate of where it thinks the start was?
        tail = slice(int(0.9 * len(est)), len(est))
        rec["tail_pos_err_m"] = round(float(err_t[tail].mean()), 3)
        rec["loop_gate_ok"] = bool(err_t[tail].mean() < 2.5)
    ok = [bool(o.align_ok) for o in pipe.outputs]
    rec["align_fail"] = int(len(ok) - sum(ok))
    rec["mean_iters"] = round(float(np.mean(
        [int(o.icp_iterations) for o in pipe.outputs[1:]])), 1)
    if os.environ.get("LOOP_SAVE_TRAJ"):
        np.save(os.environ["LOOP_SAVE_TRAJ"] + f"_{name}.npy", est)
    if posegraph:
        rec["loop_closures"] = len(pipe.loop_closures)
        rec["reanchors"] = pipe.reanchors
        rec["reanchors_rejected"] = pipe.reanchors_rejected
        rec["loop_edges_pruned"] = pipe.loop_edges_pruned
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base-icp,seg")
    ap.add_argument("--frames", type=int, default=246)
    ap.add_argument("--scan-range", type=float, default=9.0)
    ap.add_argument("--loop-radius", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--posegraph", action="store_true",
                    help="enable keyframe graph + reanchor on each variant")
    args = ap.parse_args()
    log, gtp = record_loop(args.frames, args.scan_range, args.loop_radius,
                           args.seed)
    for name in args.variants.split(","):
        run_variant(name.strip(), log, gtp, posegraph=args.posegraph)


if __name__ == "__main__":
    main()
