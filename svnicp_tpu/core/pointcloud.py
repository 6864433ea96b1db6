"""Fixed-capacity padded point clouds: crop, uniform downsample, deskew.

TPU-native replacement for the reference's PCL-based host preprocessing
(ref: svn-icp/src/core/OdometryPipeline.cpp:556-560 crop+downsample,
357-447 deskew): dynamic `pcl::PointCloud` sizes become fixed-capacity
arrays with validity masks, so every downstream jit specializes once.

Uniform downsampling reproduces PCL `UniformSampling` semantics (keep the
point closest to its voxel centroid) with a lexicographic device sort instead
of a hash map. Deskewing is the same per-point screw interpolation
exp((tau-0.5)*log dT) as the reference's TBB loop, vmapped on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svnicp_tpu.core import geometry as geo

# Voxel coordinates are packed into one int32 with 10 bits per axis (1024
# cells/axis, i.e. +-512 voxels around the origin). At the configured voxel
# sizes (>=0.2 m) this spans >=100 m in every direction; coordinates beyond
# that wrap (power-of-2 modulo) and may alias — harmless for downsampling
# (a few extra drops) and excluded by the range crop before mapping.
_BITS = 10
_MASK = (1 << _BITS) - 1
_HALF = 1 << (_BITS - 1)

INVALID_KEY = jnp.int32(2**31 - 1)


def hash32(x: jax.Array) -> jax.Array:
    """Avalanche integer hash (int32, wrapping). Used to order capacity
    truncation: dropping by hash order is spatially uniform, dropping by
    packed-key order would discard one side of the scene."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x.astype(jnp.int32)


def compaction_order(keep: jax.Array, key: jax.Array) -> jax.Array:
    """Permutation putting kept entries first, kept entries ordered by
    hash(key) so any capacity truncation drops a spatially-uniform subset."""
    h = hash32(key)
    rank = jnp.where(keep, h, jnp.iinfo(jnp.int32).max)
    # secondary argsort index keeps this deterministic across ties
    return jnp.argsort(rank, stable=True)


class PaddedCloud(NamedTuple):
    points: jax.Array  # [N,3]
    valid: jax.Array   # [N] bool

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid)


def from_numpy(points, capacity: int, dtype=jnp.float32) -> PaddedCloud:
    """Pad/truncate a host [N,3] array into a fixed-capacity cloud."""
    import numpy as np

    pts = np.zeros((capacity, 3), dtype)
    n = min(len(points), capacity)
    pts[:n] = points[:n]
    valid = np.zeros(capacity, bool)
    valid[:n] = True
    return PaddedCloud(jnp.asarray(pts), jnp.asarray(valid))


def _pack(v: jax.Array) -> jax.Array:
    vx = (v[:, 0] + _HALF) & _MASK
    vy = (v[:, 1] + _HALF) & _MASK
    vz = (v[:, 2] + _HALF) & _MASK
    return (vx << (2 * _BITS)) | (vy << _BITS) | vz


def voxel_key(points: jax.Array, voxel_size: float) -> jax.Array:
    """[N,3] -> packed int32 voxel ids (trunc-toward-zero like the reference's
    `(p / voxel).cast<int>()`, ref: VoxelHashMap.cpp:29 — note this makes the
    cell straddling each axis origin twice as wide, a reference behavior the
    map reproduces)."""
    return _pack(jnp.trunc(points / voxel_size).astype(jnp.int32))


def floor_voxel_key(points: jax.Array, voxel_size: float) -> jax.Array:
    """[N,3] -> packed int32 voxel ids on a proper uniform (floor) grid —
    PCL UniformSampling semantics, used for downsampling."""
    return _pack(jnp.floor(points / voxel_size).astype(jnp.int32))


def crop(cloud: PaddedCloud, min_range: float, max_range: float) -> PaddedCloud:
    """Range gate: keep min_range < |p| < max_range
    (ref: OdometryPipeline.cpp:692-704 — note we use the true radius, not the
    reference's squared-norm `scan_max_range_` bookkeeping quirk)."""
    d2 = jnp.sum(cloud.points * cloud.points, axis=-1)
    ok = (d2 < max_range * max_range) & (d2 > min_range * min_range)
    return PaddedCloud(cloud.points, cloud.valid & ok)


@functools.partial(jax.jit, static_argnames=("capacity",))
def downsample_uniform(
    cloud: PaddedCloud, voxel_size: float, capacity: int
) -> PaddedCloud:
    """Keep one point per voxel — the one nearest the voxel centroid.

    Matches PCL UniformSampling used by the reference
    (ref: OdometryPipeline.cpp:684-690). Output is compacted to `capacity`
    with valid points first; excess voxels beyond capacity are dropped.
    """
    n = cloud.capacity
    key = jnp.where(cloud.valid, floor_voxel_key(cloud.points, voxel_size), INVALID_KEY)
    center = (jnp.floor(cloud.points / voxel_size) + 0.5) * voxel_size
    d_center = jnp.sum((cloud.points - center) ** 2, axis=-1)
    d_center = jnp.where(cloud.valid, d_center, jnp.inf)

    # variadic sorts carry the coordinates directly: no index payloads and no
    # random [N,3] gathers (measurably cheaper on TPU)
    skey, _, sx, sy, sz = jax.lax.sort(
        (key, d_center, cloud.points[:, 0], cloud.points[:, 1],
         cloud.points[:, 2]),
        num_keys=2, is_stable=True,
    )
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    keep = first & (skey != INVALID_KEY)

    # compact: selected first in hash order (unbiased capacity truncation).
    # Selected ranks are forced even so validity falls out of the sorted
    # rank's parity (INT32_MAX is odd) — no boolean payload rides the sort.
    rank = jnp.where(keep, hash32(skey) & -2, jnp.iinfo(jnp.int32).max)
    srank, cx, cy, cz = jax.lax.sort(
        (rank, sx, sy, sz), num_keys=1, is_stable=True,
    )
    c = capacity
    ckeep = (srank[:c] & 1) == 0
    pts = jnp.stack([cx[:c], cy[:c], cz[:c]], axis=-1)
    return PaddedCloud(jnp.where(ckeep[:, None], pts, 0.0), ckeep)


@jax.jit
def deskew(
    points: jax.Array,       # [N,3]
    valid: jax.Array,        # [N]
    timestamps: jax.Array,   # [N] raw per-point times (any scale)
    delta_xi: jax.Array,     # [6] log(T_{k-2}^-1 T_{k-1}) relative motion
) -> jax.Array:
    """Motion-compensate a scan: p <- exp((tau_i - 0.5) * delta_xi) p.

    tau is the per-point timestamp min-max normalized over the scan
    (ref: OdometryPipeline.cpp:414-445). Degenerate scans (all timestamps
    equal) pass through unchanged, as in the reference (:418).
    """
    big = jnp.finfo(timestamps.dtype).max
    tmin = jnp.min(jnp.where(valid, timestamps, big))
    tmax = jnp.max(jnp.where(valid, timestamps, -big))
    span = tmax - tmin
    safe_span = jnp.where(span > 0, span, 1.0)
    tau = (timestamps - tmin) / safe_span

    def one(p, t):
        r, tr = geo.se3_exp((t - 0.5) * delta_xi)
        return r @ p + tr

    out = jax.vmap(one)(points, tau)
    return jnp.where((span > 0) & valid[..., None], out, points)


def kitti_vertical_correction(points: jax.Array) -> tuple[jax.Array, jax.Array]:
    """KITTI raw-scan fixes (ref: OdometryPipeline.cpp:385-400): rotate each
    point 0.205 deg about (p x z) and synthesize azimuth pseudo-timestamps.

    Returns (corrected points [N,3], pseudo timestamps [N]).
    """
    correction = 0.205 * jnp.pi / 180.0
    z = jnp.array([0.0, 0.0, 1.0], points.dtype)
    axis = jnp.cross(points, z[None, :])
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.maximum(norm, 1e-12)
    rot = geo.bso3_exp(correction * axis)
    corrected = jnp.einsum("nij,nj->ni", rot, points)
    yaw = -jnp.arctan2(corrected[:, 1], corrected[:, 0])
    tau = 0.5 * (yaw / jnp.pi + 1.0)
    return corrected, tau
