"""Constraint-aware source selection: LOAM-style range-image feature picks.

North-star addition (round 5, VERDICT item 1) — the reference has no
feature extraction (its ImageProjection segmentation is the LeGO-LOAM
front HALF; the edge/planar FeatureAssociation half was never vendored,
ref: svn-icp/include/segmentation/ImageProjection.h is the only
segmentation source). It is the missing tool for the measured ring-cloud
failure: 9 m-capped raycast sweeps are 76% floor and the uniform two-stage
downsample keeps ~355 ring-patterned points, leaving yaw unconstrained
(BASELINE.md, round-4 loop-proxy controls). Selection rebalances the
source cloud by CONSTRAINT DIRECTION instead of by volume:

- per-ring relative curvature (the LOAM smoothness statistic) over
  azimuth-compacted scan lines — computed on the VALID-cell sequence, so
  sparse returns (col_step'd proxies, real dropouts) see their true scan
  neighbors, not empty cells;
- per-(ring, sector) quotas via lax.top_k: edge picks (curvature maxima)
  and planar picks (curvature minima) spread over 18 azimuth sectors —
  fixed shapes, natural non-max suppression, no sequential marking;
- occlusion guard: cells whose immediate neighbor jumps by more than a
  relative range threshold are excluded — depth-discontinuity boundaries
  are viewpoint-dependent (the classic LOAM exclusion), while connected
  corners (wall junctions) remain curvature maxima;
- ground (LeGO-LOAM inter-ring angle mask, core/segmentation.ground_mask)
  is EXCLUDED from edge/planar picks and readmitted under its own capped
  quota, hash-scattered across the image — the floor keeps constraining
  z/roll/pitch without drowning yaw;
- per-point sweep times ride through the projection (RangeImage.ts), so
  selection composes with deskew exactly.

Everything runs on the fixed [R,C] grid: one projection scatter, one
per-row sort, rolls and top_k — no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svnicp_tpu.core import segmentation as seg
from svnicp_tpu.core.pointcloud import PaddedCloud


class SelectedFeatures(NamedTuple):
    points: jax.Array      # [cap,3] selected points (zeros at invalid slots)
    valid: jax.Array       # [cap] bool
    timestamps: jax.Array  # [cap] sweep times of the selected points
    n_edge: jax.Array      # scalar int32 diagnostics
    n_planar: jax.Array
    n_ground: jax.Array


def _compact_rows(img: seg.RangeImage):
    """Sort each row so valid cells form a prefix in azimuth order.

    Returns (rng [R,C], pts [R,C,3], ts [R,C], valid [R,C], n_valid [R]) —
    the compacted scan lines curvature operates on."""
    r, c = img.rng.shape
    # stable per-row sort by (invalid, col): valid cells keep azimuth order
    order = jnp.argsort(~img.valid, axis=1, stable=True)         # [R,C]
    rng_c = jnp.take_along_axis(img.rng, order, axis=1)
    ts_c = jnp.take_along_axis(img.ts, order, axis=1)
    valid_c = jnp.take_along_axis(img.valid, order, axis=1)
    pts_c = jnp.take_along_axis(img.pts, order[..., None], axis=1)
    return order, rng_c, pts_c, ts_c, valid_c


def _curvature(rng_c: jax.Array, valid_c: jax.Array, window: int):
    """LOAM smoothness on compacted scan lines: c = |sum_j (r_j - r_0)| /
    (n_valid * r_0) over +-window in-prefix neighbors; cells without a full
    window are ineligible (ref: LOAM Sec. V-A — here normalized to be
    dimensionless, so one threshold serves all ranges)."""
    r, c = rng_c.shape
    acc = jnp.zeros_like(rng_c)
    all_ok = valid_c
    for j in range(1, window + 1):
        for sgn in (-1, 1):
            shifted = jnp.roll(rng_c, -sgn * j, axis=1)
            ok = jnp.roll(valid_c, -sgn * j, axis=1)
            # roll wraps across the prefix boundary; positions within
            # `window` of either end are killed by the validity of the
            # wrapped neighbor (invalid suffix) or the edge mask below
            acc = acc + jnp.where(ok, shifted - rng_c, 0.0)
            all_ok = all_ok & ok
    idx = jnp.arange(c)[None, :]
    n_valid = jnp.sum(valid_c, axis=1)[:, None]
    in_core = (idx >= window) & (idx < n_valid - window)
    eligible = all_ok & in_core
    curv = jnp.abs(acc) / (2.0 * window * jnp.maximum(rng_c, 1e-6))
    return jnp.where(eligible, curv, -1.0), eligible


def _occlusion_free(rng_c: jax.Array, valid_c: jax.Array, rel_thr: float):
    """Immediate-neighbor relative range jump below rel_thr on both sides
    (LOAM's occluded-boundary exclusion)."""
    nxt = jnp.roll(rng_c, -1, axis=1)
    prv = jnp.roll(rng_c, 1, axis=1)
    ok_n = jnp.abs(nxt - rng_c) < rel_thr * rng_c
    ok_p = jnp.abs(prv - rng_c) < rel_thr * rng_c
    return valid_c & ok_n & ok_p


def _sector_topk(score: jax.Array, sectors: int, k: int):
    """Top-k score per (row, sector) over the compacted azimuth axis.
    Returns (flat cell index within the row [R, sectors*k], keep mask)."""
    r, c = score.shape
    cs = c // sectors
    sc = score[:, : sectors * cs].reshape(r, sectors, cs)
    top, idx = jax.lax.top_k(sc, k)                              # [R,S,k]
    base = (jnp.arange(sectors, dtype=jnp.int32) * cs)[None, :, None]
    cols = (idx.astype(jnp.int32) + base).reshape(r, sectors * k)
    keep = (top > 0.0).reshape(r, sectors * k)
    return cols, keep


@functools.partial(jax.jit, static_argnames=("sensor", "capacity", "sectors",
                                             "edge_k", "planar_k",
                                             "ground_cap"))
def select_features(
    points: jax.Array,          # [N,3] raw scan (skewed ok — see docstring)
    valid: jax.Array,           # [N]
    timestamps: jax.Array,      # [N] per-point sweep time (zeros if absent)
    sensor: seg.SensorModel,
    capacity: int,
    *,
    max_range: float = 80.0,
    sectors: int = 18,
    edge_k: int = 2,
    planar_k: int = 4,
    ground_cap: int = 512,
    edge_threshold: float = 0.05,
    planar_threshold: float = 0.02,
    occlusion_threshold: float = 0.3,
    window: int = 5,
) -> SelectedFeatures:
    """Select a constraint-balanced source cloud from a raw sweep.

    Output order is [edges, planars, ground]: on capacity overflow the
    hash-scattered ground quota is truncated first, then planar tails —
    edge constraints (the scarce yaw-observability carriers on
    floor-dominated scans) always survive.
    """
    img = seg.project(points, valid, sensor, timestamps)
    rngm = jnp.where(img.valid, img.rng, 0.0)
    in_range = img.valid & (img.rng <= max_range)
    img = img._replace(valid=in_range, rng=jnp.where(in_range, rngm, seg.INVALID))
    # horizontal-surface mask over ALL rings, not the preset's ground_rows:
    # LeGO-LOAM's groundScanInd (7 for HDL-64) assumes the floor only shows
    # in low rings, which breaks exactly in the short-range regime this
    # module exists for (9 m cap + 0.8 m sensor height puts floor returns
    # up to ring ~46 — they then leak into the planar picks and the
    # selection is floor-dominated again). The inter-ring elevation-angle
    # criterion itself is ring-independent; box tops classifying as
    # "ground" is semantically right (horizontal constraint surfaces).
    # It is ALSO noise-blind at near range: consecutive ring hits on the
    # floor at steep elevation are ~1 cm apart while range noise is ~2 cm,
    # so the 10-degree test rejects exactly the densest floor cells.
    # Second test: height against a robust floor estimate (min over
    # azimuth-box-averaged cell heights — single-return noise cannot set
    # it) classifies those; the angle test still covers distant/sloped
    # ground where ring separation is wide. A cell is ground if EITHER
    # test says so.
    import dataclasses as _dc

    ground_angle = seg.ground_mask(
        img, _dc.replace(sensor, ground_rows=sensor.n_scan - 1))

    order, rng_c, pts_c, ts_c, valid_c = _compact_rows(img)
    # floor-height test in COMPACTED space (azimuth neighbors on the raw
    # grid can all be empty — col_step'd proxies, real dropouts): box-
    # average cell heights over +-2 in-prefix neighbors, take the global
    # min as the robust floor estimate (single-return noise cannot set it)
    z_c = jnp.where(valid_c, pts_c[..., 2], jnp.inf)
    zsum = jnp.zeros_like(rng_c)
    zcnt = jnp.zeros_like(rng_c)
    for j in range(-2, 3):
        zj = jnp.roll(z_c, j, axis=1)
        ok = jnp.isfinite(zj)
        zsum = zsum + jnp.where(ok, zj, 0.0)
        zcnt = zcnt + ok.astype(zsum.dtype)
    zmean = jnp.where(zcnt >= 3, zsum / jnp.maximum(zcnt, 1.0), jnp.inf)
    floor_est = jnp.min(zmean)
    ground_z_c = valid_c & (pts_c[..., 2] < floor_est + 0.25)
    ground_c = jnp.take_along_axis(ground_angle, order, axis=1) | ground_z_c

    curv, eligible = _curvature(rng_c, valid_c, window)
    occl_free = _occlusion_free(rng_c, valid_c, occlusion_threshold)
    pickable = eligible & occl_free & ~ground_c

    # scores strictly > 0 mark real picks (top_k keep mask)
    edge_score = jnp.where(pickable & (curv > edge_threshold), curv, -1.0)
    planar_score = jnp.where(pickable & (curv < planar_threshold) & (curv >= 0),
                             planar_threshold - curv + 1e-6, -1.0)

    r, c = rng_c.shape
    e_cols, e_keep = _sector_topk(edge_score, sectors, edge_k)
    p_cols, p_keep = _sector_topk(planar_score, sectors, planar_k)

    def gather(cols, keep):
        pts = jnp.take_along_axis(pts_c, cols[..., None], axis=1)
        ts = jnp.take_along_axis(ts_c, cols, axis=1)
        return (pts.reshape(-1, 3), ts.reshape(-1), keep.reshape(-1))

    e_pts, e_ts, e_valid = gather(e_cols, e_keep)
    p_pts, p_ts, p_valid = gather(p_cols, p_keep)

    # ground quota: hash-priority top-k over the compacted cells — a
    # scattered, deterministic sample (prefix-order truncation would take
    # only the lowest rings)
    g_flat = (ground_c & valid_c).reshape(-1)
    cell = jnp.arange(r * c, dtype=jnp.uint32)
    prio = jnp.where(g_flat, (cell * jnp.uint32(2654435761)) >> 8, jnp.uint32(0))
    _, g_idx = jax.lax.top_k(prio.astype(jnp.int32), ground_cap)
    g_valid = g_flat[g_idx]
    g_pts = jnp.where(g_valid[:, None], pts_c.reshape(-1, 3)[g_idx], 0.0)
    g_ts = jnp.where(g_valid, ts_c.reshape(-1)[g_idx], 0.0)

    all_pts = jnp.concatenate([e_pts, p_pts, g_pts])
    all_ts = jnp.concatenate([e_ts, p_ts, g_ts])
    all_valid = jnp.concatenate([e_valid, p_valid, g_valid])
    # compact the valid picks to `capacity` preserving class order
    sel = jnp.argsort(~all_valid, stable=True)[:capacity]
    out_valid = all_valid[sel]
    out_pts = jnp.where(out_valid[:, None], all_pts[sel], 0.0)
    out_ts = jnp.where(out_valid, all_ts[sel], 0.0)
    return SelectedFeatures(
        out_pts, out_valid, out_ts,
        jnp.sum(e_valid).astype(jnp.int32),
        jnp.sum(p_valid).astype(jnp.int32),
        jnp.sum(g_valid).astype(jnp.int32),
    )


def as_cloud(sel: SelectedFeatures) -> PaddedCloud:
    return PaddedCloud(sel.points, sel.valid)
