"""ctypes bindings for the native host runtime (native/svnicp_native.cpp).

Build with `make -C native` (produces svnicp_tpu/io/libsvnicp_native.so).
Every entry point has a numpy fallback so the package works without the
library; `AVAILABLE` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libsvnicp_native.so")
_lib = None
if not os.path.exists(_LIB_PATH):
    # auto-build once on first import (g++ is part of the toolchain)
    _make_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
    if os.path.exists(os.path.join(_make_dir, "Makefile")):
        import subprocess

        try:
            # serialize concurrent first-import builds (pytest-xdist spawns
            # several workers; two make processes writing the .so race)
            import fcntl

            with open(os.path.join(_make_dir, ".buildlock"), "w") as _lk:
                fcntl.flock(_lk, fcntl.LOCK_EX)
                subprocess.run(["make", "-C", _make_dir], check=True,
                               capture_output=True, timeout=120)
        except Exception:
            pass
if os.path.exists(_LIB_PATH):
    _lib = ctypes.CDLL(_LIB_PATH)
    _lib.svn_read_kitti_bin.restype = ctypes.c_int
    _lib.svn_read_kitti_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib.svn_stage_scan.restype = ctypes.c_int
    _lib.svn_stage_scan.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    _lib.svn_downsample_two_stage.restype = None
    _lib.svn_downsample_two_stage.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    _lib.svn_downsample_one_stage.restype = ctypes.c_int
    _lib.svn_downsample_one_stage.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib.svn_stage_scan_ts.restype = ctypes.c_int
    _lib.svn_stage_scan_ts.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int]
    _lib.svn_downsample_one_stage_ts.restype = ctypes.c_int
    _lib.svn_downsample_one_stage_ts.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int]
    _lib.svn_extract_timestamps.restype = ctypes.c_int
    _lib.svn_extract_timestamps.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    _lib.svn_ring_create.restype = ctypes.c_void_p
    _lib.svn_ring_create.argtypes = [ctypes.c_int, ctypes.c_int]
    _lib.svn_ring_destroy.argtypes = [ctypes.c_void_p]
    _lib.svn_ring_size.restype = ctypes.c_int
    _lib.svn_ring_size.argtypes = [ctypes.c_void_p]
    _lib.svn_ring_push.restype = ctypes.c_int
    _lib.svn_ring_push.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_double]
    _lib.svn_ring_pop.restype = ctypes.c_int
    _lib.svn_ring_pop.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_double)]

AVAILABLE = _lib is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_kitti_bin(path: str, capacity: int = 1 << 18) -> np.ndarray:
    """[N,3] float32 from a KITTI velodyne .bin (native or numpy fallback)."""
    if _lib is None:
        raw = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        return np.ascontiguousarray(raw[:capacity, :3])
    out = np.empty((capacity, 3), np.float32)
    n = _lib.svn_read_kitti_bin(path.encode(), _fptr(out), capacity)
    if n < 0:
        raise IOError(f"cannot read {path}")
    return out[:n]


def stage_scan(xyz: np.ndarray, min_range: float, max_range: float,
               capacity: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Crop-by-range + pad in one pass -> (padded [capacity,3], valid, count)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    out = np.empty((capacity, 3), np.float32)
    valid = np.empty(capacity, np.uint8)
    if _lib is None:
        d2 = (xyz * xyz).sum(1)
        keep = (d2 > min_range**2) & (d2 < max_range**2) & np.isfinite(d2)
        pts = xyz[keep][:capacity]
        out[: len(pts)] = pts
        out[len(pts):] = 0
        valid[: len(pts)] = 1
        valid[len(pts):] = 0
        return out, valid.astype(bool), len(pts)
    n = _lib.svn_stage_scan(
        _fptr(xyz), len(xyz), min_range, max_range, _fptr(out),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity)
    return out, valid.astype(bool), n


def _np_downsample_stage(xyz: np.ndarray, voxel: float, capacity: int) -> np.ndarray:
    """Numpy fallback of one uniform-downsample stage — same selection and
    ordering as the native path / core.pointcloud.downsample_uniform."""
    return xyz[_np_downsample_stage_indices(xyz, voxel, capacity)]


def _np_downsample_stage_indices(xyz: np.ndarray, voxel: float,
                                 capacity: int) -> np.ndarray:
    """Selected input-row indices of one downsample stage (order included)."""
    if len(xyz) == 0:
        return np.zeros(0, np.int64)
    bits, mask, half = 10, (1 << 10) - 1, 1 << 9
    g = np.floor(xyz.astype(np.float32) / np.float32(voxel)).astype(np.int64)
    key = (((g[:, 0] + half) & mask) << (2 * bits)) | \
          (((g[:, 1] + half) & mask) << bits) | ((g[:, 2] + half) & mask)
    key = key.astype(np.int32)
    center = (np.floor(xyz / np.float32(voxel)) + 0.5) * np.float32(voxel)
    d = ((xyz - center) ** 2).sum(1).astype(np.float32)
    # stable (key, d) sort: first occurrence wins ties like the strict-< scan
    order = np.lexsort((np.arange(len(xyz)), d, key))
    skey = key[order]
    first = np.concatenate([[True], skey[1:] != skey[:-1]])
    sel = order[first]
    x = key[sel].astype(np.uint32)
    x ^= x >> 16; x = (x * np.uint32(0x7FEB352D)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 15; x = (x * np.uint32(0x846CA68B)) & np.uint32(0xFFFFFFFF)
    x ^= x >> 16
    rank = (x & np.uint32(0xFFFFFFFE)).astype(np.int32)
    ordr = np.lexsort((key[sel], rank))
    return sel[ordr][:capacity]


def downsample_two_stage(xyz: np.ndarray, voxel: float, src_capacity: int,
                         map_capacity: int) -> tuple[np.ndarray, int, np.ndarray, int]:
    """Host two-stage uniform downsample (see native svn_downsample_two_stage):
    to_map = stage(input, 0.5*voxel), source = stage(to_map, 1.5*voxel).
    Returns (map_buf [map_capacity,3] zero-padded, n_map, src_buf, n_src)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    out_map = np.zeros((map_capacity, 3), np.float32)
    out_src = np.zeros((src_capacity, 3), np.float32)
    if _lib is None:
        m = _np_downsample_stage(xyz, 0.5 * voxel, map_capacity)
        s = _np_downsample_stage(m, 1.5 * voxel, src_capacity)
        out_map[: len(m)] = m
        out_src[: len(s)] = s
        return out_map, len(m), out_src, len(s)
    n_map = ctypes.c_int()
    n_src = ctypes.c_int()
    _lib.svn_downsample_two_stage(
        _fptr(xyz), len(xyz), voxel, _fptr(out_map), map_capacity,
        ctypes.byref(n_map), _fptr(out_src), src_capacity, ctypes.byref(n_src))
    return out_map, n_map.value, out_src, n_src.value


def stage_scan_ts(xyz: np.ndarray, ts: np.ndarray, min_range: float,
                  max_range: float, capacity: int
                  ) -> tuple[np.ndarray, np.ndarray, int]:
    """`stage_scan` carrying per-point timestamps (same selection/order) ->
    (padded [capacity,3], padded ts [capacity], count)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    ts = np.ascontiguousarray(ts, np.float32)
    if _lib is None:
        d2 = (xyz * xyz).sum(1)
        keep = (d2 > min_range**2) & (d2 < max_range**2) & np.isfinite(d2)
        pts, tt = xyz[keep][:capacity], ts[keep][:capacity]
        out = np.zeros((capacity, 3), np.float32)
        out_ts = np.zeros(capacity, np.float32)
        out[: len(pts)] = pts
        out_ts[: len(pts)] = tt
        return out, out_ts, len(pts)
    out = np.empty((capacity, 3), np.float32)
    out_ts = np.empty(capacity, np.float32)
    n = _lib.svn_stage_scan_ts(_fptr(xyz), _fptr(ts), len(xyz), min_range,
                               max_range, _fptr(out), _fptr(out_ts), capacity)
    return out, out_ts, n


def downsample_one_stage_ts(xyz: np.ndarray, ts: np.ndarray, voxel: float,
                            capacity: int) -> tuple[np.ndarray, np.ndarray, int]:
    """`downsample_one_stage` carrying the selected rows' timestamps."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    ts = np.ascontiguousarray(ts, np.float32)
    out = np.zeros((capacity, 3), np.float32)
    out_ts = np.zeros(capacity, np.float32)
    if _lib is None:
        # numpy fallback: recompute the selection, then match rows back to
        # input indices to carry ts (selection identical to the native path)
        sel = _np_downsample_stage_indices(xyz, voxel, capacity)
        out[: len(sel)] = xyz[sel]
        out_ts[: len(sel)] = ts[sel]
        return out, out_ts, len(sel)
    n = _lib.svn_downsample_one_stage_ts(
        _fptr(xyz), _fptr(ts), len(xyz), voxel, _fptr(out), _fptr(out_ts),
        capacity)
    return out, out_ts, n


def downsample_one_stage(xyz: np.ndarray, voxel: float,
                         capacity: int) -> tuple[np.ndarray, int]:
    """One uniform-downsample stage -> ([capacity,3] zero-padded, count).
    Same selection/order as `downsample_two_stage`'s stage A at `voxel`."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    out = np.zeros((capacity, 3), np.float32)
    if _lib is None:
        m = _np_downsample_stage(xyz, voxel, capacity)
        out[: len(m)] = m
        return out, len(m)
    n = _lib.svn_downsample_one_stage(_fptr(xyz), len(xyz), voxel,
                                      _fptr(out), capacity)
    return out, n


_DTYPES = {"f4": 0, "f8": 1, "u4": 2}


def extract_timestamps(data: bytes | np.ndarray, n: int, stride: int,
                       offset: int, dtype: str) -> tuple[np.ndarray, bool]:
    """Normalized per-point times from interleaved records -> ([n] f32, ok)."""
    buf = np.frombuffer(data, np.uint8) if isinstance(data, bytes) else data
    out = np.empty(n, np.float32)
    if _lib is None:
        dt = np.dtype({"f4": "<f4", "f8": "<f8", "u4": "<u4"}[dtype])
        raw = buf.tobytes()
        vals = np.array(
            [np.frombuffer(raw[i * stride + offset: i * stride + offset + dt.itemsize], dt)[0]
             for i in range(n)], np.float64)
        mn, mx = vals.min(), vals.max()
        if mx <= mn:
            return out * 0, False
        out[:] = ((vals - mn) / (mx - mn)).astype(np.float32)
        return out, True
    ok = _lib.svn_extract_timestamps(
        np.ascontiguousarray(buf).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, stride, offset, _DTYPES[dtype], _fptr(out))
    if ok < 0:
        raise ValueError(f"bad dtype {dtype}")
    return out, bool(ok)


class ScanRing:
    """Lock-free SPSC scan queue backed by the native ring (threaded ingest).

    Falls back to `runtime.buffers.TimedRingBuffer` semantics when the
    library is absent.
    """

    def __init__(self, slots: int = 16, max_points: int = 1 << 17):
        self._max_points = max_points
        if _lib is None:
            from svnicp_tpu.runtime.buffers import TimedRingBuffer

            self._py = TimedRingBuffer(capacity=slots)
            self._h = None
        else:
            self._py = None
            self._h = _lib.svn_ring_create(slots, max_points * 3)

    def push(self, xyz: np.ndarray, stamp: float) -> bool:
        if self._py is not None:
            self._py.push(np.asarray(xyz, np.float32), stamp)
            return True
        xyz = np.ascontiguousarray(xyz, np.float32)
        return bool(_lib.svn_ring_push(self._h, _fptr(xyz), len(xyz), stamp))

    def pop(self) -> tuple[np.ndarray, float] | None:
        if self._py is not None:
            if len(self._py) == 0:
                return None
            v, t = self._py.pop_first()
            return v, t
        out = np.empty((self._max_points, 3), np.float32)
        stamp = ctypes.c_double()
        n = _lib.svn_ring_pop(self._h, _fptr(out), ctypes.byref(stamp))
        if n < 0:
            return None
        return out[:n], stamp.value

    def __len__(self) -> int:
        if self._py is not None:
            return len(self._py)
        return _lib.svn_ring_size(self._h)

    def __del__(self):
        if getattr(self, "_h", None) is not None:
            _lib.svn_ring_destroy(self._h)
