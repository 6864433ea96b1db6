"""Sharded-map tests on the simulated 8-device mesh: key-range ownership,
insert equivalence, and full distributed registration against map blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo, pointcloud as pc, svn, voxmap as vm
from svnicp_tpu.parallel import sharding, voxmap_sharded as vms


@pytest.fixture
def mesh(devices):
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    return sharding.make_mesh(2, 4)


def make_scan(rng, n=512):
    pts = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    return pc.from_numpy(pts, 512)


def test_sharded_insert_holds_same_points(rng, mesh):
    scan = make_scan(rng)
    # replicated reference map
    ref = vm.create(4096)
    ref, _ = vm.insert(ref, scan, jnp.eye(3), jnp.zeros(3), 1.0, 10, 200.0)
    # sharded map (4 blocks over the point axis)
    sharded = vm.create(4096)
    sharded, dropped = vms.sharded_insert(
        mesh, sharded, scan, jnp.eye(3), jnp.zeros(3), 1.0, 10, 200.0)
    assert int(dropped) == 0
    ref_pts = np.asarray(ref.points)[np.asarray(ref.valid)]
    got_pts = np.asarray(sharded.points)[np.asarray(sharded.valid)]
    assert len(got_pts) == len(ref_pts)
    # same point sets (order differs: blocks are locally sorted)
    ref_set = {tuple(np.round(p, 4)) for p in ref_pts}
    got_set = {tuple(np.round(p, 4)) for p in got_pts}
    assert ref_set == got_set
    # ownership: every valid key lies in its block's range
    keys = np.asarray(sharded.key).reshape(4, -1)
    valid = np.asarray(sharded.valid).reshape(4, -1)
    width = (1 << 30) // 4
    for s in range(4):
        ks = keys[s][valid[s]]
        assert ((ks >= s * width) & (ks < (s + 1) * width)).all(), s


def test_sharded_insert_accumulates(rng, mesh):
    m = vm.create(4096)
    total = 0
    for _ in range(3):
        scan = make_scan(rng, 256)
        m, _ = vms.sharded_insert(mesh, m, scan, jnp.eye(3), jnp.zeros(3),
                                  1.0, 10, 200.0)
        total += 256
    assert int(m.count()) <= total
    assert int(m.count()) > 500


def _shard_counts(m, n_blocks=4):
    valid = np.asarray(m.valid).reshape(n_blocks, -1)
    return valid.sum(axis=1)


def test_rebalance_spreads_a_skewed_map(rng, mesh):
    # all points in a tiny region -> one key-range shard owns ~everything
    pts = rng.uniform(0.0, 3.0, size=(1024, 3)).astype(np.float32)
    m = vm.create(4096)
    splits = vms.uniform_split_keys(4)
    m, _ = vms.sharded_insert(mesh, m, pc.from_numpy(pts, 1024),
                              jnp.eye(3), jnp.zeros(3), 1.0, 64, 200.0, splits)
    before = _shard_counts(m)
    assert before.max() > 0.9 * before.sum()  # genuinely skewed

    ref_set = {tuple(np.round(p, 4))
               for p in np.asarray(m.points)[np.asarray(m.valid)]}
    m2, splits2, dropped = vms.rebalance(mesh, m, splits)
    after = _shard_counts(m2)
    assert int(dropped) == 0
    # content preserved exactly
    got_set = {tuple(np.round(p, 4))
               for p in np.asarray(m2.points)[np.asarray(m2.valid)]}
    assert got_set == ref_set
    # occupancy balanced: no shard above ~1.5x mean (quantile sampling slack)
    assert after.max() <= 1.6 * after.mean()
    # ownership invariant holds under the new boundaries
    keys = np.asarray(m2.key).reshape(4, -1)
    valid = np.asarray(m2.valid).reshape(4, -1)
    owners = np.searchsorted(np.asarray(splits2), keys, side="right")
    for s in range(4):
        assert (owners[s][valid[s]] == s).all(), s


def test_rebalance_is_identity_when_balanced(rng, mesh):
    # uniform world -> uniform split already balanced -> no-op pass
    pts = rng.uniform(-40, 40, size=(1024, 3)).astype(np.float32)
    m = vm.create(4096)
    splits = vms.uniform_split_keys(4)
    m, _ = vms.sharded_insert(mesh, m, pc.from_numpy(pts, 1024),
                              jnp.eye(3), jnp.zeros(3), 1.0, 64, 200.0, splits)
    m2, splits2, dropped = vms.rebalance(mesh, m, splits,
                                         imbalance_threshold=3.0)
    assert int(dropped) == 0
    np.testing.assert_array_equal(np.asarray(splits2), np.asarray(splits))
    np.testing.assert_array_equal(np.asarray(m2.key), np.asarray(m.key))
    np.testing.assert_array_equal(np.asarray(m2.valid), np.asarray(m.valid))
    np.testing.assert_allclose(np.asarray(m2.points), np.asarray(m.points))


def test_insert_routes_by_rebalanced_splits(rng, mesh):
    pts = rng.uniform(0.0, 3.0, size=(512, 3)).astype(np.float32)
    m = vm.create(4096)
    splits = vms.uniform_split_keys(4)
    m, _ = vms.sharded_insert(mesh, m, pc.from_numpy(pts, 512),
                              jnp.eye(3), jnp.zeros(3), 1.0, 64, 200.0, splits)
    m, splits, _ = vms.rebalance(mesh, m, splits)
    # further inserts in the same region now spread across shards
    pts2 = rng.uniform(0.0, 3.0, size=(512, 3)).astype(np.float32)
    m, dropped = vms.sharded_insert(mesh, m, pc.from_numpy(pts2, 512),
                                    jnp.eye(3), jnp.zeros(3), 1.0, 64, 200.0,
                                    splits)
    assert int(dropped) == 0
    counts = _shard_counts(m)
    assert (counts > 0).sum() >= 3  # was 1 shard before rebalancing
    # ownership invariant under the rebalanced boundaries
    keys = np.asarray(m.key).reshape(4, -1)
    valid = np.asarray(m.valid).reshape(4, -1)
    owners = np.searchsorted(np.asarray(splits), keys, side="right")
    for s in range(4):
        assert (owners[s][valid[s]] == s).all(), s


def test_registration_against_sharded_map(rng, mesh):
    # build a structured world map via sharded inserts, then register a
    # perturbed scan against it end-to-end through the ring candidates
    n = 768
    n3 = n // 3
    floor = np.stack([rng.uniform(-10, 10, n3), rng.uniform(-10, 10, n3),
                      np.zeros(n3)], 1)
    wall1 = np.stack([rng.uniform(-10, 10, n3), np.full(n3, 8.0),
                      rng.uniform(0, 4, n3)], 1)
    wall2 = np.stack([np.full(n - 2 * n3, -6.0), rng.uniform(-10, 10, n - 2 * n3),
                      rng.uniform(0, 4, n - 2 * n3)], 1)
    cloud = np.concatenate([floor, wall1, wall2]).astype(np.float32)
    cloud += rng.normal(scale=0.01, size=cloud.shape).astype(np.float32)

    xi = jnp.asarray([0.2, -0.12, 0.06, 0.015, -0.015, 0.03], jnp.float32)
    r_true, t_true = geo.se3_exp(xi)
    target_world = np.asarray(geo.transform_points(r_true, t_true, jnp.asarray(cloud)))

    m = vm.create(8192)
    m, _ = vms.sharded_insert(mesh, m, pc.from_numpy(target_world, 1024),
                              jnp.eye(3), jnp.zeros(3), 1.0, 20, 200.0)

    cfg = SteinICPConfig(particle_count=8, iterations=40, lr=1.0, max_dist=2.8,
                         knn_count=16, early_stop=False)
    init = svn.init_particles_uniform(jax.random.PRNGKey(0), 8,
                                      cfg.init_lb, cfg.init_ub)
    res = vms.sharded_register_with_map(
        mesh, cfg, jnp.asarray(cloud), jnp.ones(n, bool), m,
        jnp.eye(3), jnp.zeros(3), init,
    )
    rc, tc = geo.so3_exp(res.mean[3:]), res.mean[:3]
    np.testing.assert_allclose(np.asarray(tc), np.asarray(t_true), atol=0.05)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(r_true), atol=0.02)
    # covariance well-formed and replicated
    assert np.isfinite(np.asarray(res.cov)).all()


def test_sharded_reanchor_matches_replicated_move(rng, mesh):
    """A rigid world-frame move of the sharded map (pose-graph re-anchor)
    holds exactly the replicated move's resident point set, with every row
    re-homed to the shard owning its NEW key (the move changes keys, so
    ownership migrates via the rebalance ring pass)."""
    pts = rng.uniform(-20, 20, size=(1024, 3)).astype(np.float32)
    splits = vms.uniform_split_keys(4)
    m = vm.create(4096)
    m, _ = vms.sharded_insert(mesh, m, pc.from_numpy(pts, 1024),
                              jnp.eye(3), jnp.zeros(3), 1.0, 10, 200.0, splits)
    # a move big enough to change most voxel keys
    dr = np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.0, 0.4], jnp.float32)))
    dt = np.asarray([5.3, -2.7, 1.1], np.float32)

    moved, dropped = vms.sharded_reanchor(mesh, m, splits,
                                          jnp.asarray(dr), jnp.asarray(dt), 1.0)
    assert int(dropped) == 0
    # same resident points as moving the replicated set directly
    ref = np.asarray(m.points)[np.asarray(m.valid)] @ dr.T + dt
    got = np.asarray(moved.points)[np.asarray(moved.valid)]
    assert len(got) == len(ref)
    ref_set = {tuple(np.round(p, 3)) for p in ref}
    got_set = {tuple(np.round(p, 3)) for p in got}
    assert ref_set == got_set
    # keys match the moved coordinates and rows live on their owner shard
    keys = np.asarray(moved.key).reshape(4, -1)
    valid = np.asarray(moved.valid).reshape(4, -1)
    ptsb = np.asarray(moved.points).reshape(4, -1, 3)
    owners = np.searchsorted(np.asarray(splits), keys, side="right")
    for s in range(4):
        assert (owners[s][valid[s]] == s).all(), s
        want = np.asarray(pc.voxel_key(jnp.asarray(ptsb[s][valid[s]]), 1.0))
        np.testing.assert_array_equal(keys[s][valid[s]], want)
        # local table stays key-sorted with valid rows first
        ks = keys[s][valid[s]]
        assert (np.diff(ks) >= 0).all()
