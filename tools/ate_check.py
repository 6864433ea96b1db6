"""ATE of the bench operating point for a given candidate method.

Runs the same synthetic sequence as bench.py and prints ATE/RPE — the
accuracy companion to bench.py's throughput line. Usage:

    python tools/ate_check.py [--method bucketed|topk|voxel]
        [--residual point_to_plane] [--frames 30]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="bucketed")
    ap.add_argument("--residual", default="point_to_plane")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--insert-every", type=int, default=1)
    ap.add_argument("--segmentation", action="store_true",
                    help="HDL-64 raycast scans through range-image "
                         "segmentation (bench.py --segmentation point)")
    ap.add_argument("--features", action="store_true",
                    help="HDL-64 raycast scans through LOAM-style feature "
                         "selection (bench.py --features point)")
    ap.add_argument("--icp-method", default="svn",
                    choices=["svn", "svgd", "svd"])
    args = ap.parse_args()

    import numpy as np

    import bench
    from svnicp_tpu.io import datasets, metrics

    pipe, times, scans = bench.build(
        args.frames, particles=64, use_pallas=True,
        candidate_method=args.method, residual=args.residual,
        insert_every=args.insert_every,
        segmentation=args.segmentation, features=args.features,
        icp_method=args.icp_method)
    _, rots, trans = datasets.synthetic_trajectory(
        args.frames, dt=0.1, speed=2.0, seed=7)
    for i in range(args.frames):
        pipe.feed_scan(float(times[i]), scans[i])
    pipe.flush()
    est = pipe.trajectory()
    gt = np.tile(np.eye(4), (args.frames, 1, 1))
    gt[:, :3, :3] = rots
    gt[:, :3, 3] = trans
    ate = metrics.ate_rmse(est, gt)
    rpe_t, rpe_r = metrics.rpe(est, gt)
    mean_iters = float(np.mean([int(o.icp_iterations) for o in pipe.outputs[1:]]))
    # covariance calibration of the per-frame ICP correction (skip the
    # bootstrap frame, which has no alignment)
    guess = np.tile(np.eye(4), (args.frames, 1, 1))
    covs = np.zeros((args.frames, 6, 6))
    for i, o in enumerate(pipe.outputs):
        guess[i, :3, :3] = np.asarray(o.guess_r)
        guess[i, :3, 3] = np.asarray(o.guess_t)
        covs[i] = np.asarray(o.cov)
    mean_nees, _ = metrics.nees(est[1:], gt[1:], guess[1:], covs[1:])
    print(json.dumps({
        "method": args.method, "residual": args.residual,
        "icp_method": args.icp_method,
        "segmentation": bool(args.segmentation),
        "frames": args.frames, "ate_rmse_m": round(float(ate), 4),
        "rpe_trans_m": round(float(rpe_t), 4),
        "rpe_rot_rad": round(float(rpe_r), 5),
        "mean_icp_iterations": round(mean_iters, 1),
        "mean_nees_6dof": round(mean_nees, 2),
    }))


if __name__ == "__main__":
    main()
