"""Device voxel map tests vs reference VoxelHashMap semantics
(insert caps, first-point eviction, radius query, fallback)."""

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.core import pointcloud as pc
from svnicp_tpu.core import voxmap


def ident():
    return jnp.eye(3), jnp.zeros(3)


def test_insert_and_count(rng):
    m = voxmap.create(1024)
    pts = rng.uniform(-10, 10, size=(100, 3)).astype(np.float32)
    cloud = pc.from_numpy(pts, 128)
    m, dropped = voxmap.insert(m, cloud, *ident(), voxel_size=1.0,
                               max_points_per_voxel=20, max_range=100.0)
    assert int(dropped) == 0
    assert int(m.count()) == 100


def test_per_voxel_cap_keeps_oldest(rng):
    m = voxmap.create(256)
    # 10 points in the same voxel, inserted in two batches of 5; cap=7
    batch1 = (np.tile([[0.5, 0.5, 0.5]], (5, 1)) + np.arange(5)[:, None] * 0.01).astype(np.float32)
    batch2 = (np.tile([[0.5, 0.5, 0.5]], (5, 1)) + (10 + np.arange(5))[:, None] * 0.01).astype(np.float32)
    m, _ = voxmap.insert(m, pc.from_numpy(batch1, 8), *ident(), voxel_size=1.0,
                         max_points_per_voxel=7, max_range=100.0)
    m, _ = voxmap.insert(m, pc.from_numpy(batch2, 8), *ident(), voxel_size=1.0,
                         max_points_per_voxel=7, max_range=100.0)
    assert int(m.count()) == 7
    got = np.sort(np.asarray(m.points)[np.asarray(m.valid)][:, 0])
    # all of batch1 survives; only 2 of batch2 fit
    np.testing.assert_allclose(got[:5], np.sort(batch1[:, 0]), atol=1e-6)
    assert (got[5:] >= 0.6 - 1e-6).all()


def test_eviction_by_distance(rng):
    m = voxmap.create(256)
    near = rng.uniform(-5, 5, size=(50, 3)).astype(np.float32)
    far = (rng.uniform(-5, 5, size=(50, 3)) + 200).astype(np.float32)
    m, _ = voxmap.insert(m, pc.from_numpy(np.concatenate([near, far]), 128), *ident(),
                         voxel_size=1.0, max_points_per_voxel=20, max_range=100.0)
    assert int(m.count()) == 50  # far voxels evicted
    kept = np.asarray(m.points)[np.asarray(m.valid)]
    assert (np.linalg.norm(kept, axis=1) < 100).all()


def test_query_radius(rng):
    m = voxmap.create(1024)
    pts = np.concatenate(
        [rng.uniform(-3, 3, size=(60, 3)), rng.uniform(40, 45, size=(40, 3))]
    ).astype(np.float32)
    m, _ = voxmap.insert(m, pc.from_numpy(pts, 128), *ident(), voxel_size=1.0,
                         max_points_per_voxel=20, max_range=500.0)
    tgt, overflow = voxmap.query_radius(m, jnp.zeros(3), jnp.asarray(10.0), 256)
    assert int(overflow) == 0
    got = np.asarray(tgt.points)[np.asarray(tgt.valid)]
    assert len(got) == 60
    assert (np.linalg.norm(got, axis=1) < 12).all()


def test_query_radius_fallback_to_full_map(rng):
    m = voxmap.create(256)
    pts = (rng.uniform(-2, 2, size=(30, 3)) + 50).astype(np.float32)
    m, _ = voxmap.insert(m, pc.from_numpy(pts, 32), *ident(), voxel_size=1.0,
                         max_points_per_voxel=20, max_range=500.0)
    # radius selects nothing -> whole map returned (ref: OdometryPipeline.cpp:578-580)
    tgt, _ = voxmap.query_radius(m, jnp.zeros(3), jnp.asarray(1.0), 64)
    assert int(tgt.count()) == 30


def test_capacity_overflow_drops_and_reports(rng):
    m = voxmap.create(64)
    pts = rng.uniform(-50, 50, size=(200, 3)).astype(np.float32)
    m, dropped = voxmap.insert(m, pc.from_numpy(pts, 256), *ident(), voxel_size=1.0,
                               max_points_per_voxel=20, max_range=1000.0)
    assert int(m.count()) == 64
    assert int(dropped) > 0


def test_map_stays_sorted_and_first_point_semantics(rng):
    m = voxmap.create(512)
    for _ in range(3):
        pts = rng.uniform(-20, 20, size=(100, 3)).astype(np.float32)
        m, _ = voxmap.insert(m, pc.from_numpy(pts, 128), *ident(), voxel_size=2.0,
                             max_points_per_voxel=5, max_range=100.0)
    keys = np.asarray(m.key)
    assert (np.diff(keys.astype(np.int64)) >= 0).all()
    # per-voxel cap respected
    valid_keys = keys[np.asarray(m.valid)]
    _, counts = np.unique(valid_keys, return_counts=True)
    assert (counts <= 5).all()
