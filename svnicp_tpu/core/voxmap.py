"""Device-resident voxel-hash local map.

TPU-native rebuild of the reference's CPU `VoxelHashMap`
(ref: svn-icp/src/core/VoxelHashMap.cpp + include/core/VoxelHashMap.h:45-53,
a tsl::robin_map<Vector3i, pcl::PointCloud>): the map lives entirely in
device memory as a fixed-capacity *sorted-by-voxel-key* point table, so
insertion, per-voxel capping, eviction and radius queries are dense sorts,
segmented scans and masked gathers — no host round-trips and no pointers.

Semantics preserved from the reference:
- per-voxel point cap, first-come-first-kept (AddPointCloud,
  VoxelHashMap.cpp:22-41: existing points survive, new ones fill remaining
  slots);
- whole-voxel eviction by the distance of the voxel's *first* point
  (RemoveFarPointCloud, :93-101);
- radius queries gate whole voxels by the first point's distance
  (GetMap(pose,max_range), :51-61).

Divergence (documented): global capacity is fixed; when a frame would
overflow it, a spatially-uniform subset of rows (chosen by a per-row hash
threshold) is shed to fit (the reference grows without bound). `insert`
reports the drop count so callers can observe pressure.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core.pointcloud import INVALID_KEY, PaddedCloud, voxel_key


class VoxelMap(NamedTuple):
    """Sorted-by-key padded point table. Invalid slots carry INVALID_KEY and
    sort to the end."""

    points: jax.Array   # [C,3] world-frame points
    key: jax.Array      # [C] int32 packed voxel id (sorted ascending)
    valid: jax.Array    # [C] bool

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid)

    def empty(self) -> jax.Array:
        return ~jnp.any(self.valid)


def create(capacity: int, dtype=jnp.float32) -> VoxelMap:
    return VoxelMap(
        points=jnp.zeros((capacity, 3), dtype),
        key=jnp.full((capacity,), INVALID_KEY, jnp.int32),
        valid=jnp.zeros((capacity,), bool),
    )


def _first_point_per_run(sorted_key: jax.Array) -> jax.Array:
    """For each slot of a key-sorted array, the index of the first slot with
    the same key (the voxel's 'first point')."""
    n = sorted_key.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    return jax.lax.cummax(jnp.where(first, idx, 0))


def _first_run_flag(sorted_key: jax.Array, flag: jax.Array) -> jax.Array:
    """Broadcast a per-row boolean from each run's FIRST row to the whole run
    (rows key-sorted). Equivalent to `flag[_first_point_per_run(key)]` but
    gather-free: the run-start index rides the high bits of one cummax and
    the bit rides the LSB (a random [N] gather measured ~1 ms at map sizes
    on v5e; this is a single int32 scan)."""
    n = sorted_key.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    packed = jnp.where(first, idx * 2 + flag.astype(jnp.int32), 0)
    return (jax.lax.cummax(packed) & 1).astype(bool)


@functools.partial(jax.jit, static_argnames=("voxel_size", "max_points_per_voxel", "max_range"))
def insert(
    vmap_state: VoxelMap,
    scan: PaddedCloud,        # points in the *scan* frame
    pose_r: jax.Array,        # [3,3] world pose of the scan
    pose_t: jax.Array,        # [3]
    voxel_size: float,
    max_points_per_voxel: int,
    max_range: float,
) -> tuple[VoxelMap, jax.Array]:
    """Transform the scan to world, merge into the map with per-voxel caps,
    then evict voxels far from the current position.

    Returns (new map, dropped point count). One fused device program per
    frame (ref: AddPointCloud + RemoveFarPointCloud).
    """
    c = vmap_state.capacity
    world_pts = geo.transform_points(pose_r, pose_t, scan.points)
    new_key = jnp.where(scan.valid, voxel_key(world_pts, voxel_size), INVALID_KEY)

    # old points first => stable sort keeps them ahead of new ones per voxel.
    # Variadic lax.sort carries the coordinates through the sort directly —
    # measurably cheaper on TPU than argsort + a random [N,3] gather.
    all_pts = jnp.concatenate([vmap_state.points, world_pts], axis=0)
    all_key = jnp.concatenate([vmap_state.key, new_key], axis=0)
    skey, sx, sy, sz = jax.lax.sort(
        (all_key, all_pts[:, 0], all_pts[:, 1], all_pts[:, 2]),
        num_keys=1, is_stable=True,
    )

    # per-voxel rank; cap at max_points_per_voxel
    start = _first_point_per_run(skey)
    rank = jnp.arange(skey.shape[0], dtype=jnp.int32) - start
    keep = (skey != INVALID_KEY) & (rank < max_points_per_voxel)

    # whole-voxel eviction by the first point's distance (reference
    # semantics); one elementwise distance pass + a gather-free run broadcast
    d2 = (sx - pose_t[0]) ** 2 + (sy - pose_t[1]) ** 2 + (sz - pose_t[2]) ** 2
    keep &= _first_run_flag(skey, d2 <= max_range * max_range)

    kept_total = jnp.sum(keep)

    # capacity shedding, branch-free (a lax.cond here measured 0.31 ms of
    # overhead vs the ~0.1 ms single-operand threshold sort): rank rows by a
    # per-row avalanche hash and keep those below the c-th smallest value —
    # a spatially-uniform subset. With no overflow the c-th smallest value
    # is the INT32_MAX filler (or the largest kept hash), so the gate
    # degenerates to keep-everything. Hash ties at the threshold may keep a
    # few extra rows; the compact sort truncates those at the key-order
    # tail (drop count unaffected).
    from svnicp_tpu.core.pointcloud import hash32

    shed = hash32(skey ^ (rank.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)).astype(jnp.int32))
    shed = jnp.where(keep, shed, jnp.iinfo(jnp.int32).max)
    thresh = jax.lax.sort(shed)[c - 1]
    keep &= shed <= thresh

    # kept rows already sit in key order: one stable sort on the masked key
    # both compacts kept rows to the front and keeps the key-sorted
    # invariant (invalid keys sort to the end). Validity falls out of the
    # key (packed keys use 30 bits, so never equal INVALID_KEY) — no
    # boolean payload rides the sort.
    fkey, fx, fy, fz = jax.lax.sort(
        (jnp.where(keep, skey, INVALID_KEY), sx, sy, sz),
        num_keys=1, is_stable=True,
    )
    fkeep = fkey[:c] != INVALID_KEY
    pts = jnp.where(fkeep[:, None],
                    jnp.stack([fx[:c], fy[:c], fz[:c]], axis=-1), 0.0)
    return VoxelMap(pts, fkey[:c], fkeep), jnp.maximum(kept_total - c, 0)


@functools.partial(jax.jit, static_argnames=("target_capacity",))
def query_radius(
    vmap_state: VoxelMap,
    center: jax.Array,        # [3] query position (current pose translation)
    radius: jax.Array,        # scalar
    target_capacity: int,
) -> tuple[PaddedCloud, jax.Array]:
    """Extract all map points whose voxel's first point lies within `radius`,
    compacted into a fixed-size target cloud (ref: GetMap(pose, max_range),
    VoxelHashMap.cpp:51-61). Falls back to the whole map when the radius
    selects nothing (ref: OdometryPipeline.cpp:578-580).

    Returns (target cloud [target_capacity], overflow count of in-radius
    points that did not fit).
    """
    from svnicp_tpu.core.pointcloud import hash32

    d2 = jnp.sum((vmap_state.points - center[None, :]) ** 2, axis=-1)
    in_radius = vmap_state.valid & _first_run_flag(
        vmap_state.key, d2 <= radius * radius)
    any_hit = jnp.any(in_radius)
    selected = jnp.where(any_hit, in_radius, vmap_state.valid)

    # compact selected rows first in hash order (spatially-uniform capacity
    # truncation); variadic sort carries the coordinates, avoiding a random
    # [C,3] gather. Selected ranks are forced even (hash & -2) so validity
    # falls out of the sorted rank's parity (INT32_MAX is odd) — no boolean
    # payload rides the sort.
    rank = jnp.where(selected, hash32(vmap_state.key) & -2,
                     jnp.iinfo(jnp.int32).max)
    srank, qx, qy, qz = jax.lax.sort(
        (rank, vmap_state.points[:, 0], vmap_state.points[:, 1],
         vmap_state.points[:, 2]),
        num_keys=1, is_stable=True,
    )
    tc = target_capacity
    keep = (srank[:tc] & 1) == 0
    pts = jnp.where(keep[:, None],
                    jnp.stack([qx[:tc], qy[:tc], qz[:tc]], axis=-1), 0.0)
    overflow = jnp.maximum(jnp.sum(selected) - target_capacity, 0)
    return PaddedCloud(pts, keep), overflow


def get_all(vmap_state: VoxelMap) -> PaddedCloud:
    """The whole map as a padded cloud (ref: GetMap(), VoxelHashMap.cpp:43-49)."""
    return PaddedCloud(vmap_state.points, vmap_state.valid)


# 27-neighborhood offsets, static
_OFFSETS = jnp.asarray(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    jnp.int32,
)


@functools.partial(jax.jit, static_argnames=("voxel_size", "per_voxel_cap"))
def voxel_candidates(
    vmap_state: VoxelMap,
    query_pts: jax.Array,     # [B,3] source points at the initial guess (world)
    query_valid: jax.Array,   # [B]
    voxel_size: float,
    per_voxel_cap: int,
) -> tuple[jax.Array, jax.Array]:
    """Correspondence candidates via the voxel hash itself: the 27-voxel
    neighborhood of each query point, up to `per_voxel_cap` points per voxel.

    This is the kd-tree-free NN the TPU design targets (BASELINE.json:
    "kd-tree -> fused voxel-hash NN"): the map's key-sorted layout makes
    bucket lookup a vectorized binary search (log C gathers) — no brute-force
    distance pass over the map at all. Coverage guarantee: any map point
    within `voxel_size` of the query lies inside the neighborhood, so the
    1-NN is exact whenever it is closer than one voxel; more distant
    correspondences fall to the ICP outlier gate (same trade the reference's
    GetNeighbourMap made, VoxelHashMap.cpp:63-91).

    Returns (cand_pts [B, 27*cap, 3], cand_valid [B, 27*cap]).
    """
    b = query_pts.shape[0]
    c = vmap_state.capacity
    v = jnp.trunc(query_pts / voxel_size).astype(jnp.int32)      # trunc = map keys
    neigh = v[:, None, :] + _OFFSETS[None, :, :]                 # [B,27,3]
    from svnicp_tpu.core.pointcloud import _pack

    keys27 = _pack(neigh.reshape(-1, 3)).reshape(b, 27)
    start = jnp.searchsorted(vmap_state.key, keys27, side="left")
    end = jnp.searchsorted(vmap_state.key, keys27, side="right")
    take = start[..., None] + jnp.arange(per_voxel_cap, dtype=jnp.int32)
    in_run = take < end[..., None]                               # [B,27,cap]
    take = jnp.clip(take, 0, c - 1)
    cand = vmap_state.points[take]                               # [B,27,cap,3]
    valid = in_run & vmap_state.valid[take] & query_valid[:, None, None]
    k = 27 * per_voxel_cap
    return cand.reshape(b, k, 3), valid.reshape(b, k)
