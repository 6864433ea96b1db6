"""Stein-kernel A/B at the reference's own particle counts (round 5).

The round-4 verdict: geode P=10 and subt P=30 fell outside the fused
Stein kernel's P%8 gate; the masked-padding path (stein_pallas true_p)
now admits them. This measures kernel-ON vs kernel-OFF at those counts,
interleaved in ONE process with the order alternating across reps (the
repo's A/B convention — tunnel epochs drift, only back-to-back
comparisons are meaningful).

Usage: python tools/stein_ab.py [--particles 10,30] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(pipe, times, scans, warmup=3):
    out = None
    for i in range(warmup):
        out = pipe.feed_scan(float(times[i]), scans[i]) or out
    out = pipe.flush() or out
    np.asarray(out.pose_t)
    t0 = time.perf_counter()
    for i in range(warmup, len(scans)):
        out = pipe.feed_scan(float(times[i]), scans[i]) or out
    out = pipe.flush() or out
    np.asarray(out.pose_t)
    return (len(scans) - warmup) / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", default="10,30")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=23)
    args = ap.parse_args()

    import bench
    from svnicp_tpu.runtime import pipeline as pl

    for p in (int(x) for x in args.particles.split(",")):
        pipes = {}
        for stein in (True, False):
            pipe, times, scans = bench.build(
                args.frames, p, use_pallas=True, stein_kernel=stein)
            pipes[stein] = (pipe.cfg, times, scans)
        samples = {True: [], False: []}
        for rep in range(args.reps):
            order = (True, False) if rep % 2 == 0 else (False, True)
            for stein in order:
                cfg, times, scans = pipes[stein]
                fps = measure(pl.LIOPipeline(cfg), times, scans)
                samples[stein].append(fps)
        print(json.dumps({
            "particles": p,
            "kernel_on": [round(s, 1) for s in samples[True]],
            "kernel_off": [round(s, 1) for s in samples[False]],
            "median_on": round(float(np.median(samples[True])), 1),
            "median_off": round(float(np.median(samples[False])), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
