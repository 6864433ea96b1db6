"""Preprocessing tests: crop, uniform downsample (PCL-semantics oracle), deskew."""

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import pointcloud as pc


def test_crop(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 30
    cloud = pc.from_numpy(pts, 256)
    out = pc.crop(cloud, 5.0, 25.0)
    norms = np.linalg.norm(pts, axis=1)
    expect = (norms > 5.0) & (norms < 25.0)
    np.testing.assert_array_equal(np.asarray(out.valid)[:200], expect)
    assert not np.asarray(out.valid)[200:].any()


def test_downsample_one_point_per_voxel(rng):
    pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    cloud = pc.from_numpy(pts, 512)
    out = pc.downsample_uniform(cloud, 2.0, 512)
    got = np.asarray(out.points)[np.asarray(out.valid)]
    # one point per (floor-grid) voxel
    vox = np.floor(got / 2.0).astype(int)
    keys = {tuple(v) for v in vox}
    assert len(keys) == len(got)
    # oracle: every occupied voxel represented, by its centroid-closest point
    vox_all = np.floor(pts / 2.0).astype(int)
    all_keys = {tuple(v) for v in vox_all}
    assert keys == all_keys
    for p in got:
        v = np.floor(p / 2.0)
        center = (v + 0.5) * 2.0
        same = pts[(np.floor(pts / 2.0) == v).all(axis=1)]
        d_all = ((same - center) ** 2).sum(1)
        d_got = ((p - center) ** 2).sum()
        assert d_got <= d_all.min() + 1e-5


def test_downsample_ignores_invalid(rng):
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    cloud = pc.PaddedCloud(jnp.asarray(pts), jnp.asarray(np.arange(100) < 50))
    out = pc.downsample_uniform(cloud, 0.01, 128)  # tiny voxel: no merging
    assert int(out.count()) == 50


def test_deskew_recovers_static_scan(rng):
    # points sampled along the sweep of a moving sensor: applying deskew with
    # the true motion must undo the per-point displacement
    n = 300
    base = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)
    tau = np.linspace(0, 1, n).astype(np.float32)
    xi = jnp.asarray([0.5, -0.2, 0.1, 0.02, -0.01, 0.03], jnp.float32)
    skewed = []
    for i in range(n):
        r, t = geo.se3_exp((0.5 - tau[i]) * xi)  # inverse of the deskew motion
        skewed.append(np.asarray(r) @ base[i] + np.asarray(t))
    skewed = np.stack(skewed).astype(np.float32)
    out = pc.deskew(jnp.asarray(skewed), jnp.ones(n, bool), jnp.asarray(tau), xi)
    np.testing.assert_allclose(np.asarray(out), base, atol=1e-4)


def test_deskew_passthrough_on_constant_timestamps(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    out = pc.deskew(
        jnp.asarray(pts), jnp.ones(50, bool), jnp.zeros(50), jnp.ones(6)
    )
    np.testing.assert_array_equal(np.asarray(out), pts)


def test_voxel_key_conventions():
    pts = jnp.asarray(
        [[0.1, 0.1, 0.1], [1.1, 0.1, 0.1], [0.1, 1.1, 0.1], [0.1, 0.1, 1.1], [-0.9, 0.1, 0.1]]
    )
    floor_keys = np.asarray(pc.floor_voxel_key(pts, 1.0))
    assert len(set(floor_keys.tolist())) == 5
    trunc_keys = np.asarray(pc.voxel_key(pts, 1.0))
    # reference `(p/voxel).cast<int>()` quirk: -0.9 and 0.1 share voxel 0
    assert trunc_keys[0] == trunc_keys[4]
    assert len(set(trunc_keys.tolist())) == 4
