"""Device-time breakdown of the flagship odometry step.

Runs bench.py's operating point for a few steady-state frames under
`jax.profiler.trace` and prints the top ops by total device time, grouped by
a coarse stage heuristic. Usage:

    python tools/profile_step.py [--frames 8] [--residual point_to_plane]

The isolated-op caveat applies (see BASELINE.md): this measures ops INSIDE
the real step program, which is the only trustworthy context.
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(trace_dir: str):
    """Yield (op_name, duration_ps, occurrences) from the device planes of the
    newest xplane.pb under trace_dir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    totals = collections.Counter()
    counts = collections.Counter()
    for plane in xspace.planes:
        name = plane.name.lower()
        if not ("tpu" in name or "device" in name or "xla op" in name):
            continue
        if "host" in name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # XLA op lines carry per-op events; "steps"/"xla modules" lines
            # are aggregates we skip to avoid double counting
            lname = line.name.lower()
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                meta = ev_meta[ev.metadata_id]
                totals[meta.name] += ev.duration_ps
                counts[meta.name] += 1
    return totals, counts


STAGES = [
    ("sort", "map/query sorts"),
    ("fusion", "xla fusions"),
    ("dot", "matmuls"),
    ("custom", "pallas kernels"),       # custom-call / tpu_custom_call
    ("stein_update", "pallas kernels"),
    ("fused_moments", "pallas kernels"),
    ("dynamic-update-slice", "slice updates"),
    ("copy", "copies"),
    ("convert", "converts"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--residual", default="point_to_plane")
    ap.add_argument("--method", default="bucketed")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--keep", default="", help="keep trace dir at this path")
    args = ap.parse_args()

    import jax
    import numpy as np

    import bench

    warm = 3
    pipe, times, scans = bench.build(
        warm + args.frames, particles=64, use_pallas=True,
        candidate_method=args.method, residual=args.residual)
    out = None
    for i in range(warm):
        out = pipe.feed_scan(float(times[i]), scans[i]) or out
    np.asarray(out.pose_t)

    trace_dir = args.keep or tempfile.mkdtemp(prefix="svnicp_trace_")
    jax.profiler.start_trace(trace_dir)
    for i in range(warm, warm + args.frames):
        out = pipe.feed_scan(float(times[i]), scans[i]) or out
    np.asarray(out.pose_t)
    jax.profiler.stop_trace()

    totals, counts = parse_xplane(trace_dir)
    total_ps = sum(totals.values())
    per_frame_ms = total_ps / 1e9 / args.frames
    print(f"\ntotal device time: {per_frame_ms:.2f} ms/frame "
          f"over {args.frames} frames\n")

    print(f"{'op':<72} {'ms/frame':>9} {'n/frame':>8} {'%':>6}")
    for name, ps in totals.most_common(args.top):
        ms = ps / 1e9 / args.frames
        n = counts[name] / args.frames
        print(f"{name[:72]:<72} {ms:9.3f} {n:8.1f} {100 * ps / total_ps:5.1f}%")

    groups = collections.Counter()
    for name, ps in totals.items():
        # classify by the op's own name (before " = "), not the whole HLO
        # line — operand names otherwise leak into the wrong group
        head = name.split(" = ")[0].lower()
        for key, label in STAGES:
            if key in head:
                groups[label] += ps
                break
        else:
            groups["other"] += ps
    print("\nby group:")
    for label, ps in groups.most_common():
        print(f"  {label:<24} {ps / 1e9 / args.frames:8.3f} ms/frame "
              f"{100 * ps / total_ps:5.1f}%")
    if not args.keep:
        import shutil

        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
