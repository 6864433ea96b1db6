"""Host-side ingest & staging for LIOPipeline (split from pipeline.py).

The host half of the reference's sensor plumbing (ref: callback threads +
ring buffers, svn-icp/src/core/OdometryPipeline.cpp:106-110, 449-658):
IMU window bookkeeping and interpolation, scan packing into the fixed
device buffers, the native host-downsample staging path, the stage-ahead
worker thread, and the threaded-ingest SPSC-ring topology. `LIOPipeline`
mixes this in; the dispatch half (feed_scan, batching, flush) stays in
runtime/pipeline.py.
"""

from __future__ import annotations

import time

import numpy as np


class IngestDriver:
    """Mixin: staging/ingest methods for LIOPipeline (host attributes are
    initialized in LIOPipeline.__post_init__)."""

    def feed_imu(self, t: float, acc, gyro) -> None:
        dt = 0.0 if self._last_imu_time is None else t - self._last_imu_time
        self._last_imu_time = t
        self._imu_samples.append((dt, np.asarray(acc, np.float64), np.asarray(gyro, np.float64)))
        self._imu_times.append(t)

    def _take_imu_window(self, t_frame: float):
        """Collect (dt, acc, gyro) triples covering up to t_frame, consuming
        the queue; synthesizes the interpolated boundary sample."""
        out = []
        times = self._imu_times
        samples = self._imu_samples
        n_used = 0
        for i, t in enumerate(times):
            if t <= t_frame:
                out.append(samples[i])
                n_used = i + 1
            else:
                prev_t = times[i - 1] if i > 0 else None
                if prev_t is not None and prev_t < t_frame < t:
                    gap = t - prev_t
                    off = t_frame - prev_t
                    ratio = off / gap
                    acc = (1 - ratio) * samples[i - 1][1] + ratio * samples[i][1]
                    gyro = (1 - ratio) * samples[i - 1][2] + ratio * samples[i][2]
                    out.append((off, acc, gyro))
                    # shorten the following sample's dt to (t - t_frame)
                    samples[i] = (gap - off, samples[i][1], samples[i][2])
                break
        del times[:n_used]
        del samples[:n_used]
        return out

    def _pack_frame(self, t: float, points: np.ndarray, timestamps):
        """Stage one frame into the packed host buffers shipped to the
        device: scan_buf [cap,4] (xyz + per-point time), imu_buf [W,7]
        (dt + acc + gyro), meta [4] f64 (stamp, n_points, n_imu,
        n_imu_dropped). Both
        staging paths produce prefix-valid rows, so validity travels as the
        counts in `meta` instead of two boolean arrays."""
        cap = self.cfg.preprocess.raw_capacity
        with self.timer.span("preprocess"):
            points = self._apply_extrinsic(points)
            scan_buf = np.zeros((cap, 4), self.cfg.np_dtype)
            if timestamps is None:
                # native one-pass crop+pad (timestamp path must keep point
                # order aligned with the timestamps, so it stays on the
                # plain pad path)
                from svnicp_tpu.io import native

                pts, _, n = native.stage_scan(
                    points, self.cfg.preprocess.min_range,
                    self.cfg.preprocess.max_range, cap,
                )
                n = min(int(n), cap)
                scan_buf[:, :3] = pts
            else:
                n = min(len(points), cap)
                scan_buf[:n, :3] = points[:n]
                scan_buf[:n, 3] = np.asarray(timestamps[:n])

        if self.cfg.preprocess.quantize_upload:
            # raw-path quantized upload (round 5): the segmentation/feature
            # operating points ship the RAW padded scan (up to ~2.3 MB f32
            # at HDL-64 capacity) and the tunnel transfer is their frame
            # floor; int16 on the same 2^-8 m grid as the host-downsample
            # path halves it. The 4th channel (normalized sweep time) rides
            # the same grid (~0.4%-of-a-sweep resolution, as on the pre
            # path); dequantized on device in _unpack_frame.
            scan_buf = np.clip(np.round(scan_buf * 256.0), -32768,
                               32767).astype(np.int16)
        imu_buf, n_imu, n_drop = self._pack_imu(t)
        meta = np.array([t, n, n_imu, n_drop], np.float64)
        return scan_buf, imu_buf, meta

    def _apply_extrinsic(self, points: np.ndarray) -> np.ndarray:
        """lidar -> IMU extrinsic compensation at ingest
        (ref: OdometryPipeline.cpp:349 transformPointCloud by T_lidar_imu)."""
        r_ext = np.asarray(self.cfg.lio.extrinsic_R, np.float32).reshape(3, 3)
        t_ext = np.asarray(self.cfg.lio.extrinsic_t, np.float32)
        if np.allclose(r_ext, np.eye(3)) and np.allclose(t_ext, 0.0):
            return points
        return np.asarray(points, np.float32) @ r_ext.T + t_ext

    def _pack_imu(self, t: float) -> tuple[np.ndarray, int, int]:
        """Returns (imu_buf [W,7], n_samples, n_dropped). When a frame window
        exceeds `imu_window` (long frame gap), the OLDEST samples are dropped
        and counted — silent propagation loss would otherwise degrade the
        ESKF invisibly (the count surfaces as FrameOutput.imu_dropped)."""
        w = self.imu_window
        window = self._take_imu_window(t)
        n_drop = max(len(window) - w, 0)
        if n_drop:
            import sys

            self.imu_dropped_total += n_drop
            print(f"[svnicp] WARNING: IMU window overflow at t={t:.3f}: "
                  f"dropped {n_drop} oldest samples (window={w}); raise "
                  f"LIOPipeline.imu_window for long frame gaps",
                  file=sys.stderr)
        triples = window[-w:]
        imu_buf = np.zeros((w, 7), self.cfg.np_dtype)
        for i, (dt, a, g) in enumerate(triples):
            imu_buf[i, 0] = dt
            imu_buf[i, 1:4] = a
            imu_buf[i, 4:7] = g
        return imu_buf, len(triples), n_drop

    def _stage_scan_pre(self, points: np.ndarray, timestamps=None):
        """Scan half of the host-preprocessed staging: native crop + the
        stage-A (0.5*voxel) uniform downsample, packed as ONE [2*src_cap,3]
        upload (or [2*src_cap,4] with the selected rows' sweep times when
        deskewing). The stage-B source cloud is derived on DEVICE from this
        cloud (identical selection), so only the coarse cloud ships over
        the tunnel. Pure (no pipeline state), so it can run on the
        stage-ahead worker thread; the native calls release the GIL."""
        with self.timer.span("preprocess"):
            return self._stage_scan_pre_untimed(points, timestamps)

    def _stage_scan_pre_untimed(self, points: np.ndarray, timestamps=None):
        from svnicp_tpu.io import native

        pp = self.cfg.preprocess
        points = self._apply_extrinsic(points)
        cap2 = 2 * self.cfg.icp.source_capacity
        if timestamps is not None:
            pts, ts, n = native.stage_scan_ts(
                np.asarray(points, np.float32),
                np.asarray(timestamps, np.float32),
                pp.min_range, pp.max_range, pp.raw_capacity)
            map_buf, map_ts, n_map = native.downsample_one_stage_ts(
                pts[: int(n)], ts[: int(n)], 0.5 * pp.voxel_size, cap2)
            map_buf = np.concatenate([map_buf, map_ts[:, None]], axis=1)
        else:
            pts, _, n = native.stage_scan(
                np.asarray(points, np.float32), pp.min_range, pp.max_range,
                pp.raw_capacity)
            map_buf, n_map = native.downsample_one_stage(
                pts[: int(n)], 0.5 * pp.voxel_size, cap2)
        if pp.quantize_upload:
            # 2^-8 m grid, +/-128 m — dequantized on device (see
            # odometry_step_packed_pre); halves the tunnel upload. Config
            # validation bounds max_range; the clip guards stray outliers.
            q = np.clip(np.round(map_buf * 256.0), -32768, 32767)
            return q.astype(np.int16), n_map
        return map_buf.astype(self.cfg.np_dtype, copy=False), n_map

    def _pack_frame_pre(self, t: float, points: np.ndarray, timestamps=None):
        """Host-preprocessed staging (preprocess.host_downsample): scan
        staging + imu window + meta [4] = (stamp, n_map, n_imu, n_drop)."""
        ds_buf, n_map = self._stage_scan_pre(points, timestamps)
        imu_buf, n_imu, n_drop = self._pack_imu(t)
        meta = np.array([t, n_map, n_imu, n_drop], np.float64)
        return ds_buf, imu_buf, meta

    def _stage_frame(self, t: float, points: np.ndarray, timestamps) -> FrameInput:
        """FrameInput form of `_pack_frame` (tests / direct step calls)."""
        import jax.numpy as jnp

        from svnicp_tpu.runtime.pipeline import _unpack_frame

        scan_buf, imu_buf, meta = self._pack_frame(t, points, timestamps)
        return _unpack_frame(self.cfg, jnp.asarray(scan_buf), jnp.asarray(imu_buf),
                             jnp.asarray(meta))

    def _feed_scan_ahead(self, t: float, points: np.ndarray,
                        timestamps=None) -> FrameOutput | None:
        """Stage-ahead mode (cfg.stage_ahead): submit frame t's scan staging
        to the worker thread, dispatch the previously staged frame. The
        2-3 ms of native staging overlaps the device computing the prior
        frame; adds one frame of output latency (flush() drains the tail).
        The IMU window is packed HERE (main thread) so queue consumption
        stays ordered with feed_imu calls."""
        import concurrent.futures

        if self._stage_pool is None:
            self._stage_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="svnicp-stage")
        imu_buf, n_imu, n_drop = self._pack_imu(t)
        fut = self._stage_pool.submit(self._timed_stage_pre, points, timestamps)
        idx = self._frames            # this frame's device frame_idx,
        self._frames += 1             # captured before the increment
        self._last_frame_time = t
        self._pending.append((t, imu_buf, n_imu, n_drop, fut, idx))
        if len(self._pending) > 1:
            return self._dispatch_pending()
        return None

    def _timed_stage_pre(self, points, timestamps=None):
        """Worker-thread staging with its own wall clock, so the stage-ahead
        path attributes preprocessing time to the RIGHT frame (the shared
        StageTimer would mix frames across threads)."""
        t0 = time.perf_counter()
        out = self._stage_scan_pre_untimed(points, timestamps)
        return out, time.perf_counter() - t0

    def _dispatch_pending(self) -> FrameOutput:
        t0, imu_buf, n_imu, n_drop, fut, idx = self._pending.pop(0)
        (ds_buf, n_map), pre_dt = fut.result()
        meta = np.array([t0, n_map, n_imu, n_drop], np.float64)
        from svnicp_tpu.runtime.pipeline import (HostFrameOutput,
                                                 odometry_step_packed_pre)

        with self.timer.span("dispatch"):
            self.state, out = odometry_step_packed_pre(
                self.cfg, self.state, *self._put((ds_buf, imu_buf, meta)),
                mesh=self.mesh, skip_insert=self._skip_insert(idx))
        out = HostFrameOutput(out)
        self.outputs.append(out)
        self.times.append(t0)
        self.frame_timings.append({
            "preprocessing_time": pre_dt,
            "steinicp_time": self.timer.last.get("dispatch", 0.0),
        })
        self._maybe_rebalance()
        return out

    # -------------------------------------------------------- threaded ingest

    def run_threaded(self, scan_stream, ring_slots: int = 16) -> int:
        """Consume a scan iterator through a producer thread + the native
        lock-free SPSC ring, processing frames as they arrive.

        This is the executor topology of the reference (sensor callbacks on
        their own threads feeding the ICP worker through ring buffers,
        ref: SVNICPNode.cpp:24-25 + OdometryPipeline.cpp:106-110): ingest
        parsing/copies overlap device compute. Returns frames processed.
        """
        import threading

        from svnicp_tpu.io.native import ScanRing

        ring = ScanRing(slots=ring_slots,
                        max_points=self.cfg.preprocess.raw_capacity)
        done = threading.Event()

        def producer():
            for t, pts in scan_stream:
                while not ring.push(np.asarray(pts, np.float32), float(t)):
                    if done.is_set():
                        return
                    threading.Event().wait(0.001)
            done.set()

        worker = threading.Thread(target=producer, daemon=True)
        worker.start()
        n0 = len(self.outputs)
        try:
            while True:
                item = ring.pop()
                if item is None:
                    if done.is_set() and len(ring) == 0:
                        break
                    threading.Event().wait(0.0005)
                    continue
                pts, t = item
                self.feed_scan(t, pts)
            # staged-ahead / batched tail: the last frame(s) may still be
            # pending after the producer stream ends
            self.flush()
        finally:
            done.set()
            worker.join(timeout=5)
        return len(self.outputs) - n0

