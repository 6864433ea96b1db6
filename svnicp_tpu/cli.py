"""Command-line entry points (the reference's launch/ layer, ROS-free).

Replaces `ros2 launch svn-icp *.launch.py` + rosbag playback
(ref: svn-icp/launch/SVN_ICP.launch.py:59-66) with:

    python -m svnicp_tpu.cli demo   [--config CFG] [--frames N] [--output out.jsonl]
    python -m svnicp_tpu.cli kitti  --velodyne DIR [--poses FILE] [--config CFG] ...

Both stream structured JSONL records (io/records.py) instead of 13 ROS
topics and print an evaluation summary (ATE/RPE) at the end — evaluation the
reference left to offline tooling.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time


def _load_config(path: str | None):
    from svnicp_tpu import config as cfg_mod

    if path is None:
        return cfg_mod.PipelineConfig()
    return cfg_mod.from_yaml(path)


def _open_writer(path: str | None):
    from svnicp_tpu.io.records import JSONLWriter

    if path is None:
        return None, contextlib.nullcontext()
    f = open(path, "w")
    return JSONLWriter(f), contextlib.closing(f)


def _run_stream(cfg, stream, imu_stream=None, writer=None, gt_poses=None,
                progress=True):
    import numpy as np

    from svnicp_tpu.io import metrics, records
    from svnicp_tpu.runtime import pipeline as pl

    pipe = pl.LIOPipeline(cfg)
    if writer is not None:
        writer.write(records.ParametersRecord.from_config(cfg))
    if imu_stream is not None:
        for t, acc, gyro in imu_stream:
            pipe.feed_imu(t, acc, gyro)

    n_frames = 0
    kf_mode = cfg.lio.estimator == "kf"

    def drain_new() -> None:
        # records come from the pipeline's own (time, output, timing)
        # triples so stage_ahead / dispatch_batch latency can't skew them
        nonlocal n_frames
        while n_frames < len(pipe.outputs):
            t_out = pipe.times[n_frames]
            out = pipe.outputs[n_frames]
            timing = pipe.frame_timings[n_frames]
            n_frames += 1
            if writer is not None:
                # converting the output to records syncs on the device
                # result, so the sync span completes the (async) dispatch
                # wall into a true per-frame alignment time
                t_sync = time.perf_counter()
                recs = records.frame_records(t_out, out,
                                             include_kf_gain=kf_mode)
                sync_wall = time.perf_counter() - t_sync
                writer.write(records.RuntimeRecord(
                    stamp=t_out,
                    preprocessing_time=timing["preprocessing_time"],
                    steinicp_time=timing["steinicp_time"] + sync_wall,
                    finish_iter=int(out.icp_iterations)))
                writer.write_all(recs)
            if progress and n_frames % 20 == 0:
                p = np.asarray(out.pose_t)
                print(f"[svnicp] frame {n_frames}  "
                      f"pose=({p[0]:.2f},{p[1]:.2f},{p[2]:.2f})"
                      f"  map={int(out.map_points)}", file=sys.stderr)

    t_start = time.perf_counter()
    for item in stream:
        t, pts = item[0], item[1]
        ts = item[2] if len(item) > 2 else None
        pipe.feed_scan(t, pts, ts)
        drain_new()
    pipe.flush()    # staged-ahead / batched tail
    drain_new()
    wall = time.perf_counter() - t_start

    est = pipe.trajectory()
    summary = {"frames": n_frames, "wall_seconds": round(wall, 3),
               "frames_per_sec": round(n_frames / max(wall, 1e-9), 3)}
    if gt_poses is not None and len(est) == len(gt_poses):
        summary["ate_rmse_m"] = round(metrics.ate_rmse(est, gt_poses), 4)
        rpe_t, rpe_r = metrics.rpe(est, gt_poses)
        summary["rpe_trans_m"] = round(rpe_t, 4)
        summary["rpe_rot_rad"] = round(rpe_r, 5)
    print(json.dumps(summary))
    return pipe, summary


def cmd_demo(args):
    import numpy as np

    from svnicp_tpu.core.imu import GRAVITY
    from svnicp_tpu.io import datasets

    cfg = _load_config(args.config)
    if args.save_particles:
        import dataclasses

        cfg = dataclasses.replace(cfg, save_particles=True)
    world = datasets.SyntheticWorld(extent=60.0, seed=args.seed)
    times, rots, trans = datasets.synthetic_trajectory(
        args.frames, dt=0.1, speed=1.5, seed=args.seed, ramp_seconds=1.0)
    rng = np.random.default_rng(args.seed)

    def stream():
        for i in range(args.frames):
            yield float(times[i]), world.scan_at(rng, rots[i], trans[i],
                                                 n_points=args.points)

    imu = (datasets.synthetic_imu(times, rots, trans, GRAVITY)
           if cfg.lio.estimator == "kf" else None)
    gt = np.tile(np.eye(4), (args.frames, 1, 1))
    gt[:, :3, :3] = rots
    gt[:, :3, 3] = trans
    writer, ctx = _open_writer(args.output)
    with ctx:
        _run_stream(cfg, stream(), imu, writer, gt)


def cmd_kitti(args):
    import numpy as np

    from svnicp_tpu.io import datasets

    cfg = _load_config(args.config)
    stream = datasets.kitti_sequence(args.velodyne, args.times)
    if args.kitti_correction:
        # per-point vertical-offset fix + azimuth pseudo-timestamps for
        # deskewing (ref: OdometryPipeline.cpp:385-400)
        import jax.numpy as jnp

        from svnicp_tpu.core.pointcloud import kitti_vertical_correction

        def corrected(raw_stream):
            for t, pts in raw_stream:
                fixed, tau = kitti_vertical_correction(jnp.asarray(pts))
                yield t, np.asarray(fixed), np.asarray(tau)

        stream = corrected(stream)
    if args.max_frames:
        import itertools

        stream = itertools.islice(stream, args.max_frames)
    gt = None
    if args.poses:
        gt = datasets.read_kitti_poses(args.poses)
        if args.max_frames:
            gt = gt[: args.max_frames]
    writer, ctx = _open_writer(args.output)
    with ctx:
        _run_stream(cfg, stream, None, writer, gt)


def cmd_stream(args):
    """Play a recorded SVNL sensor stream (io/stream.py) through the live
    pipeline — the offline equivalent of the reference's ROS subscribers
    (ref: OdometryPipeline.cpp:307-354)."""
    import numpy as np

    from svnicp_tpu.io import metrics, records
    from svnicp_tpu.io import stream as stream_mod
    from svnicp_tpu.runtime import pipeline as pl

    cfg = _load_config(args.config)
    pipe = pl.LIOPipeline(cfg)
    writer, ctx = _open_writer(args.output)
    t0 = time.perf_counter()
    with ctx, open(args.log, "rb") as f:
        if writer is not None:
            writer.write(records.ParametersRecord.from_config(cfg))

        def progress(n, stamp):
            if n % 20 == 0:
                print(f"[svnicp] stream frame {n} @ {stamp:.2f}s",
                      file=sys.stderr)

        n = stream_mod.play(pipe, f, progress=progress)
        wall = time.perf_counter() - t0
        if writer is not None:
            kf_mode = cfg.lio.estimator == "kf"
            for t_out, out, timing in zip(pipe.times, pipe.outputs,
                                          pipe.frame_timings):
                writer.write(records.RuntimeRecord(
                    stamp=t_out,
                    preprocessing_time=timing["preprocessing_time"],
                    steinicp_time=timing["steinicp_time"],
                    finish_iter=int(out.icp_iterations)))
                writer.write_all(records.frame_records(
                    t_out, out, include_kf_gain=kf_mode))
    est = pipe.trajectory()
    summary = {"frames": n, "wall_seconds": round(wall, 3),
               "frames_per_sec": round(n / max(wall, 1e-9), 3)}
    if args.gt:
        gt = np.load(args.gt)
        if len(gt) == len(est):
            summary["ate_rmse_m"] = round(metrics.ate_rmse(est, gt), 4)
    print(json.dumps(summary))


def cmd_record(args):
    """Generate a synthetic SVNL log (+ ground-truth poses .npy) — a data
    source for `stream` without real sensors."""
    import numpy as np

    from svnicp_tpu.io import stream as stream_mod

    if args.proxy:
        gt = stream_mod.record_proxy(
            args.log, n_frames=args.frames, seed=args.seed,
            col_step=args.col_step)
    else:
        gt = stream_mod.record_synthetic(
            args.log, n_frames=args.frames, seed=args.seed,
            n_points=args.points)
    if args.gt:
        np.save(args.gt, gt)
    print(json.dumps({"log": args.log, "frames": args.frames,
                      "proxy": bool(args.proxy)}))


def main(argv=None):
    # multi-process runtime (parallel/distributed.py): when a launcher set
    # SVNICP_COORDINATOR, every spawned process runs this same command line
    # and joins the jax.distributed mesh before any backend touch
    from svnicp_tpu.parallel import distributed

    distributed.maybe_initialize_from_env()
    ap = argparse.ArgumentParser(prog="svnicp_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("demo", help="synthetic ground-truthed sequence")
    d.add_argument("--config", default=None)
    d.add_argument("--frames", type=int, default=40)
    d.add_argument("--points", type=int, default=8000)
    d.add_argument("--seed", type=int, default=0)
    d.add_argument("--output", default=None, help="JSONL record stream path")
    d.add_argument("--save-particles", action="store_true",
                   help="record per-iteration particle trajectories "
                        "(ParticleHistoryRecord, ref /svnicp/all_particles)")
    d.set_defaults(fn=cmd_demo)

    k = sub.add_parser("kitti", help="KITTI odometry sequence directory")
    k.add_argument("--velodyne", required=True)
    k.add_argument("--times", default=None)
    k.add_argument("--poses", default=None)
    k.add_argument("--config", default=None)
    k.add_argument("--max-frames", type=int, default=0)
    k.add_argument("--kitti-correction", action="store_true",
                   help="apply the 0.205 deg vertical fix + azimuth timestamps")
    k.add_argument("--output", default=None)
    k.set_defaults(fn=cmd_kitti)

    s = sub.add_parser("stream", help="play a recorded SVNL sensor stream")
    s.add_argument("--log", required=True, help="SVNL packet log path")
    s.add_argument("--config", default=None)
    s.add_argument("--gt", default=None, help="[N,4,4] poses .npy for ATE")
    s.add_argument("--output", default=None, help="JSONL record stream path")
    s.set_defaults(fn=cmd_stream)

    r = sub.add_parser("record", help="write a synthetic SVNL stream")
    r.add_argument("--log", required=True)
    r.add_argument("--frames", type=int, default=20)
    r.add_argument("--points", type=int, default=4000)
    r.add_argument("--seed", type=int, default=5)
    r.add_argument("--gt", default=None, help="write ground-truth poses .npy")
    r.add_argument("--proxy", action="store_true",
                   help="realistic proxy log: motion-distorted HDL-64 "
                        "raycast sweeps + noisy/biased 100 Hz IMU "
                        "(io/stream.record_proxy)")
    r.add_argument("--col-step", type=int, default=3,
                   help="proxy azimuth decimation (1 = full 2250 columns)")
    r.set_defaults(fn=cmd_record)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
