"""SubT-MRS proxy operating point: throughput study (round 5, VERDICT 2).

Round 4 measured the reference-faithful SubT point (configs/subt_mrs.yaml:
pure ICP, P=30, 0.2 m voxels, 1 pt/voxel, stop 1e-4) at 0.62 fps on the
60-frame proxy log, naming four unattacked costs: P=30 outside the fused
Stein kernel's gate, 262144-row map re-sorts, near-full 100-iteration
alignments, and the multi-MB raw upload. This harness measures the attack:

  subt        the verbatim operating point (reproduction row — now with
              the padded fused kernels, which P=30 takes since round 5)
  subt-fast   same REGISTRATION MATH, faster execution strategy:
              host-native crop+downsample with int16 quantized upload
              (ships ~100 KB instead of the 2 MB raw buffer; the two-stage
              selection is bit-compatible with the device path) + deskew on
              (the proxy sweeps are genuinely distorted; round 4 measured
              deskew cutting ATE 26%) + stage-ahead staging

Usage: python tools/subt_speed.py [--variants subt,subt-fast] [--frames 60]
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


def record_straight(frames: int, seed: int) -> tuple[str, str]:
    from svnicp_tpu.io import stream as stream_mod

    key = hashlib.sha1(f"straight5 {frames} {seed}".encode()).hexdigest()[:12]
    log = f"/tmp/subt_proxy_{key}.svnl"
    gtp = f"/tmp/subt_proxy_{key}_gt.npy"
    if not (os.path.exists(log) and os.path.exists(gtp)):
        t0 = time.perf_counter()
        gt = stream_mod.record_proxy(log, n_frames=frames, seed=seed)
        np.save(gtp, gt)
        print(f"[subt_speed] recorded {frames} frames in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    return log, gtp


def variant_config(name: str):
    from svnicp_tpu import config as cfg_mod

    cfg = cfg_mod.from_yaml(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "subt_mrs.yaml"))
    if name == "subt":
        return cfg
    if name == "subt-fast":
        return dataclasses.replace(
            cfg,
            preprocess=dataclasses.replace(
                cfg.preprocess, deskew=True, host_downsample=True,
                quantize_upload=True),
            stage_ahead=True,
        )
    raise SystemExit(f"unknown variant {name!r}")


def run_variant(name: str, log: str, gtp: str, repeat: int = 2):
    from svnicp_tpu.io import metrics
    from svnicp_tpu.io import stream as stream_mod
    from svnicp_tpu.runtime import pipeline as pl

    cfg = variant_config(name)
    gt = np.load(gtp)
    samples = []
    ate = None
    for rep in range(repeat):
        pipe = pl.LIOPipeline(cfg)
        t0 = time.perf_counter()
        with open(log, "rb") as f:
            n = stream_mod.play(pipe, f)
        pipe.close()
        wall = time.perf_counter() - t0
        samples.append(n / wall)
        est = pipe.trajectory()
        if len(est) == len(gt):
            ate = round(metrics.ate_rmse(est, gt), 4)
    rec = {"variant": name, "frames": n,
           "fps_warm": round(max(samples), 2),
           "fps_all": [round(s, 2) for s in samples], "ate_rmse_m": ate}
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="subt,subt-fast")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    log, gtp = record_straight(args.frames, args.seed)
    for name in args.variants.split(","):
        run_variant(name.strip(), log, gtp, repeat=args.repeat)


if __name__ == "__main__":
    main()
