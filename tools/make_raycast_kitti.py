"""Generate a KITTI-odometry-format sequence from HDL-64 raycast scans.

Real LiDAR datasets (GEODE, SubT-MRS, KITTI) cannot be provisioned in this
offline environment, so the external-validity run for the KITTI reader path
(`cli.py kitti` -> io/native.read_kitti_bin -> full pipeline) uses scans
raycast with the true HDL-64E ray pattern (64 x 2250, the geometry the
reference hard-codes at ImageProjection.h:63-68) over the structured
synthetic world — real file format, real ray geometry, real reader path;
synthetic geometry. Writes velodyne/*.bin (x,y,z,intensity f32), times.txt
and poses.txt (cam0-convention 3x4 rows — identity calib assumed).

Usage: python tools/make_raycast_kitti.py --out DIR [--frames 25]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from svnicp_tpu.io import datasets

    world = datasets.SyntheticWorld(extent=80.0, n_walls=24, n_boxes=16,
                                    seed=args.seed)
    times, rots, trans = datasets.synthetic_trajectory(
        args.frames, dt=0.1, speed=2.0, seed=args.seed)
    rng = np.random.default_rng(args.seed)

    vel = os.path.join(args.out, "velodyne")
    os.makedirs(vel, exist_ok=True)
    for i in range(args.frames):
        pts = datasets.raycast_scan(world._surfaces, rots[i], trans[i],
                                    max_range=75.0, rng=rng)
        rec = np.zeros((len(pts), 4), np.float32)
        rec[:, :3] = pts
        rec[:, 3] = 0.5  # constant intensity (dropped by the reader)
        rec.tofile(os.path.join(vel, f"{i:06d}.bin"))
    np.savetxt(os.path.join(args.out, "times.txt"), times, fmt="%.6f")
    poses = np.concatenate([rots, trans[:, :, None]], axis=2).reshape(-1, 12)
    np.savetxt(os.path.join(args.out, "poses.txt"), poses, fmt="%.9f")
    print(f"wrote {args.frames} HDL-64 raycast frames to {args.out}")


if __name__ == "__main__":
    main()
