"""Native host library tests: C implementations vs numpy fallbacks.

Runs against libsvnicp_native.so when built (make -C native), and verifies
the fallbacks too so the package never silently changes behavior.
"""

import os
import tempfile
import threading

import numpy as np
import pytest

from svnicp_tpu.io import native


def test_library_is_built():
    # the repo ships the Makefile; CI builds it before the suite
    assert native.AVAILABLE, "run `make -C native` first"


def test_read_kitti_bin(rng, tmp_path):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "000000.bin"
    pts.tofile(p)
    out = native.read_kitti_bin(str(p))
    np.testing.assert_allclose(out, pts[:, :3], atol=0)
    # capacity clamp
    out2 = native.read_kitti_bin(str(p), capacity=10)
    assert out2.shape == (10, 3)


def test_read_missing_file_raises(tmp_path):
    if not native.AVAILABLE:
        pytest.skip("native only")
    with pytest.raises(IOError):
        native.read_kitti_bin(str(tmp_path / "nope.bin"))


def test_stage_scan_matches_fallback(rng):
    xyz = (rng.normal(size=(500, 3)) * 30).astype(np.float32)
    xyz[5] = [np.nan, 0, 0]
    out_n, valid_n, n_n = native.stage_scan(xyz, 2.0, 50.0, 256)
    # numpy oracle
    d2 = np.nan_to_num((xyz * xyz).sum(1), nan=np.inf)
    keep = (d2 > 4.0) & (d2 < 2500.0)
    expect = xyz[keep][:256]
    assert n_n == len(expect)
    np.testing.assert_allclose(out_n[:n_n], expect, atol=0)
    assert valid_n[:n_n].all() and not valid_n[n_n:].any()
    assert (out_n[n_n:] == 0).all()


def test_extract_timestamps(rng):
    n, stride, offset = 64, 22, 16
    raw = np.zeros(n * stride, np.uint8)
    times = rng.uniform(100.0, 101.0, n).astype(np.float32)
    for i in range(n):
        raw[i * stride + offset: i * stride + offset + 4] = np.frombuffer(
            times[i].tobytes(), np.uint8)
    out, ok = native.extract_timestamps(raw.tobytes(), n, stride, offset, "f4")
    assert ok
    expect = (times - times.min()) / (times.max() - times.min())
    np.testing.assert_allclose(out, expect, atol=1e-5)
    # degenerate: constant timestamps
    raw2 = np.zeros(n * stride, np.uint8)
    out2, ok2 = native.extract_timestamps(raw2.tobytes(), n, stride, offset, "f4")
    assert not ok2


def test_scan_ring_spsc(rng):
    ring = native.ScanRing(slots=4, max_points=128)
    assert ring.pop() is None
    a = rng.normal(size=(50, 3)).astype(np.float32)
    assert ring.push(a, 1.5)
    assert len(ring) == 1
    got, t = ring.pop()
    assert t == 1.5
    np.testing.assert_allclose(got, a, atol=0)
    # overflow drops
    for i in range(6):
        ring.push(a, float(i))
    assert len(ring) == 4

    # threaded producer/consumer
    ring2 = native.ScanRing(slots=8, max_points=64)
    scans = [rng.normal(size=(32, 3)).astype(np.float32) for _ in range(50)]
    received = []

    def producer():
        for i, s in enumerate(scans):
            while not ring2.push(s, float(i)):
                pass

    def consumer():
        while len(received) < 50:
            item = ring2.pop()
            if item is not None:
                received.append(item)

    tp, tc = threading.Thread(target=producer), threading.Thread(target=consumer)
    tp.start(); tc.start(); tp.join(); tc.join()
    assert [t for _, t in received] == [float(i) for i in range(50)]
    for (got, t), want in zip(received, scans):
        np.testing.assert_allclose(got, want, atol=0)


def test_downsample_two_stage_native_matches_fallback(rng):
    """C++ and numpy implementations must produce identical clouds."""
    if not native.AVAILABLE:
        pytest.skip("native lib not built")
    xyz = (rng.normal(size=(5000, 3)) * 8).astype(np.float32)
    m_n, nm_n, s_n, ns_n = native.downsample_two_stage(xyz, 1.0, 256, 512)
    m_f = native._np_downsample_stage(xyz, 0.5, 512)
    s_f = native._np_downsample_stage(m_f, 1.5, 256)
    assert nm_n == len(m_f) and ns_n == len(s_f)
    np.testing.assert_array_equal(m_n[:nm_n], m_f)
    np.testing.assert_array_equal(s_n[:ns_n], s_f)


def test_downsample_two_stage_matches_device_path(rng):
    """Host downsample must reproduce core.pointcloud.downsample_uniform
    exactly (same selection, same hash-rank compaction order)."""
    import jax.numpy as jnp

    from svnicp_tpu.core import pointcloud as pc

    xyz = (rng.normal(size=(3000, 3)) * 8).astype(np.float32)
    cap_map, cap_src = 512, 256
    cloud = pc.PaddedCloud(jnp.asarray(xyz), jnp.ones(len(xyz), bool))
    to_map_dev = pc.downsample_uniform(cloud, 0.5, cap_map)
    src_dev = pc.downsample_uniform(to_map_dev, 1.5, cap_src)

    m_buf, n_map, s_buf, n_src = native.downsample_two_stage(
        xyz, 1.0, cap_src, cap_map)
    dev_m = np.asarray(to_map_dev.points)[np.asarray(to_map_dev.valid)]
    dev_s = np.asarray(src_dev.points)[np.asarray(src_dev.valid)]
    assert n_map == len(dev_m) and n_src == len(dev_s)
    np.testing.assert_allclose(m_buf[:n_map], dev_m, atol=0)
    np.testing.assert_allclose(s_buf[:n_src], dev_s, atol=0)


def test_downsample_capacity_truncation(rng):
    xyz = (rng.normal(size=(4000, 3)) * 20).astype(np.float32)
    m_buf, n_map, s_buf, n_src = native.downsample_two_stage(xyz, 0.5, 16, 32)
    assert n_map <= 32 and n_src <= 16
    assert np.all(m_buf[n_map:] == 0) and np.all(s_buf[n_src:] == 0)


def test_downsample_boundary_values_match_device():
    """floor(p / v) vs floor(p * (1/v)) differ for some float32 inputs at
    non-power-of-two voxel sizes (e.g. 7.4999995 at v=1.5) — the native
    kernel must divide exactly like the device path."""
    import jax.numpy as jnp

    from svnicp_tpu.core import pointcloud as pc

    vals = np.array([7.4999995, -7.4999995, 4.4999995, 1.4999999,
                     2.9999998, 10.499999, 0.0, 1.5], np.float32)
    xyz = np.stack([vals, vals * 0.5, -vals], axis=1).astype(np.float32)
    cloud = pc.PaddedCloud(jnp.asarray(xyz), jnp.ones(len(xyz), bool))
    dev = pc.downsample_uniform(cloud, 0.75, 16)   # = 0.5 * voxel 1.5
    dev_pts = np.asarray(dev.points)[np.asarray(dev.valid)]

    m_buf, n_map, _, _ = native.downsample_two_stage(xyz, 1.5, 16, 16)
    assert n_map == len(dev_pts)
    np.testing.assert_array_equal(m_buf[:n_map], dev_pts)


def test_ts_staging_matches_numpy_fallback(rng):
    """ts-carrying crop + downsample: native selection and carried
    timestamps must match the numpy fallback exactly."""
    from svnicp_tpu.io import native

    pts = rng.normal(size=(3000, 3)).astype(np.float32) * 20
    ts = rng.random(3000).astype(np.float32)
    a_xyz, a_ts, an = native.stage_scan_ts(pts, ts, 1.0, 40.0, 4096)
    d2 = (pts * pts).sum(1)
    keep = (d2 > 1.0) & (d2 < 1600.0)
    np.testing.assert_array_equal(a_xyz[: int(an)], pts[keep][:4096])
    np.testing.assert_array_equal(a_ts[: int(an)], ts[keep][:4096])

    b_xyz, b_ts, bn = native.downsample_one_stage_ts(
        a_xyz[: int(an)], a_ts[: int(an)], 0.5, 2048)
    sel = native._np_downsample_stage_indices(a_xyz[: int(an)], 0.5, 2048)
    np.testing.assert_array_equal(b_xyz[: int(bn)], a_xyz[: int(an)][sel])
    np.testing.assert_array_equal(b_ts[: int(bn)], a_ts[: int(an)][sel])
    assert int(bn) == len(sel)
