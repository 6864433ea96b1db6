"""Map-block sharding: the voxel map partitioned across the point axis.

Implements the BASELINE config-5 layout ("particles+map blocks sharded"):
each point-axis mesh group owns one static key-range slab of the voxel map
(contiguous packed-key ranges = x-slabs, so voxel runs never straddle
shards and all per-voxel semantics from `core/voxmap` apply locally and
unchanged). The particle axis replicates the map blocks.

Candidate search across distributed map blocks uses a **ring gather**
(the same communication shape as ring attention, SURVEY.md §5): each step
every shard computes bucketed group-min candidates of its local source
points against the currently-held map block, then `ppermute`s the block to
its ring neighbor; after S steps every source point has candidates from
every block, with only O(block) ICI traffic per step and no all-gather of
the map.

Key ranges start as a uniform static split of the packed key space and can
be **rebalanced online** (`rebalance`): shards drift in occupancy as the
vehicle moves, so every K frames the caller may recompute the `split_keys`
boundaries from a weighted sample of resident keys (all_gather of ~S*512
int32 — tiny) and redistribute rows with the same ring `ppermute` pass the
candidate gather uses. See docs/DESIGN-map-sharding.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import svn
from svnicp_tpu.core import voxmap as vm
from svnicp_tpu.core.pointcloud import (INVALID_KEY, PaddedCloud, compaction_order,
                                        voxel_key)
from svnicp_tpu.parallel import sharding

_KEY_SPACE = 1 << 30  # packed keys live in [0, 2^30)


def shard_bounds(shard_idx: jax.Array, n_shards: int) -> tuple[jax.Array, jax.Array]:
    """[lo, hi) packed-key range owned by a shard (uniform static split)."""
    width = _KEY_SPACE // n_shards
    lo = shard_idx * width
    hi = jnp.where(shard_idx == n_shards - 1, jnp.int32(_KEY_SPACE), lo + width)
    return jnp.int32(lo), jnp.int32(hi)


def uniform_split_keys(n_shards: int) -> jax.Array:
    """[S-1] upper boundaries of the uniform static split: shard s owns keys
    in [splits[s-1], splits[s]) with implicit splits[-1]=0, splits[S-1]=inf."""
    width = _KEY_SPACE // n_shards
    return jnp.arange(1, n_shards, dtype=jnp.int32) * width


def owner_of(keys: jax.Array, split_keys: jax.Array) -> jax.Array:
    """Shard index owning each packed key under the given boundaries."""
    return jnp.searchsorted(split_keys, keys, side="right").astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mesh", "voxel_size", "max_points_per_voxel",
                                             "max_range"))
def sharded_insert(
    mesh: Mesh,
    vmap_global: vm.VoxelMap,   # [C] arrays, C divisible by point shards
    scan: PaddedCloud,          # replicated scan (already downsampled)
    pose_r: jax.Array, pose_t: jax.Array,
    voxel_size: float, max_points_per_voxel: int, max_range: float,
    split_keys: jax.Array | None = None,   # [S-1] boundaries (None = uniform)
) -> tuple[vm.VoxelMap, jax.Array]:
    """Insert a scan into the sharded map: each block masks the scan to its
    key range and runs the ordinary local insert — zero collectives beyond
    the (replicated) scan input."""
    if split_keys is None:
        split_keys = uniform_split_keys(mesh.shape[sharding.POINT_AXIS])

    def body(points_l, key_l, valid_l, scan_pts, scan_valid, r, t, splits):
        me = jax.lax.axis_index(sharding.POINT_AXIS)
        world = geo.transform_points(r, t, scan_pts)
        keys = voxel_key(world, voxel_size)
        mine = scan_valid & (owner_of(keys, splits) == me)
        local = vm.VoxelMap(points_l, key_l, valid_l)
        new_local, dropped = vm.insert(
            local, PaddedCloud(scan_pts, mine), r, t,
            voxel_size, max_points_per_voxel, max_range,
        )
        return (new_local.points, new_local.key, new_local.valid,
                jax.lax.psum(dropped, sharding.POINT_AXIS))

    pts, key, valid, dropped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS), P(sharding.POINT_AXIS),
            P(None, None), P(None), P(None, None), P(None), P(None),
        ),
        out_specs=(P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS),
                   P(sharding.POINT_AXIS), P()),
        check_vma=False,
    )(vmap_global.points, vmap_global.key, vmap_global.valid,
      scan.points, scan.valid, pose_r, pose_t, split_keys)
    return vm.VoxelMap(pts, key, valid), dropped


def _ring_redistribute(points_l, key_l, valid_l, splits, me, n_shards):
    """One full ring ``ppermute`` pass moving rows to the shard that owns
    their key under ``splits``: each shard keeps an accumulator of its local
    capacity, absorbing the rows it owns from every visiting block
    (hash-ordered truncation on overflow, same policy as `voxmap.insert`).
    Shared by `rebalance` (ownership changed because the boundaries moved)
    and `sharded_reanchor` (ownership changed because the keys moved).

    Row order is made layout-independent by carrying each row's *global
    pre-pass rank* (shard * capacity + local row) and sorting the result by
    (key, rank): block-local tables are key-sorted under the ownership
    invariant, so concatenating blocks in shard order IS the replicated
    table's row order — and within-voxel order (which the per-voxel cap's
    first-point semantics depend on) therefore matches the replicated
    path's stable sort even when a reanchor merges rows from several shards
    into one voxel (ring arrival order alone does not).

    Returns (points, key, valid, dropped) for the local shard; the result
    table is (key, origin-rank)-sorted with valid rows first.
    """
    cl = key_l.shape[0]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    rank_l = me * cl + jnp.arange(cl, dtype=jnp.int32)

    def step(carry, _):
        pts, key, valid, rank, acc_pts, acc_key, acc_valid, acc_rank, dropped = carry
        mine = valid & (owner_of(key, splits) == me)
        cat_key = jnp.concatenate([acc_key, jnp.where(mine, key, INVALID_KEY)])
        cat_pts = jnp.concatenate([acc_pts, pts])
        cat_valid = jnp.concatenate([acc_valid, mine])
        cat_rank = jnp.concatenate([acc_rank, rank])
        kept_total = jnp.sum(cat_valid)
        korder = compaction_order(cat_valid, cat_key)[:cl]
        k_keep = cat_valid[korder]
        k_key = jnp.where(k_keep, cat_key[korder], INVALID_KEY)
        k_pts = jnp.where(k_keep[:, None], cat_pts[korder], 0.0)
        k_rank = cat_rank[korder]
        s_key, s_rank, sx, sy, sz = jax.lax.sort(
            (k_key, k_rank, k_pts[:, 0], k_pts[:, 1], k_pts[:, 2]),
            num_keys=2, is_stable=True)
        s_pts = jnp.stack([sx, sy, sz], axis=-1)
        s_keep = s_key != INVALID_KEY
        # int32 explicitly: under jax x64 the bool-sum promotes to int64
        # and would break the scan carry's dtype invariance
        dropped += jnp.maximum(kept_total - cl, 0).astype(jnp.int32)
        pts = jax.lax.ppermute(pts, sharding.POINT_AXIS, perm)
        key = jax.lax.ppermute(key, sharding.POINT_AXIS, perm)
        valid = jax.lax.ppermute(valid, sharding.POINT_AXIS, perm)
        rank = jax.lax.ppermute(rank, sharding.POINT_AXIS, perm)
        return (pts, key, valid, rank,
                s_pts, s_key, s_keep, s_rank, dropped), None

    acc0 = (points_l, key_l, valid_l, rank_l,
            jnp.zeros_like(points_l), jnp.full_like(key_l, INVALID_KEY),
            jnp.zeros_like(valid_l), jnp.zeros_like(key_l),
            jnp.zeros((), jnp.int32))
    (_, _, _, _, acc_pts, acc_key, acc_valid, _, dropped), _ = jax.lax.scan(
        step, acc0, None, length=n_shards
    )
    return acc_pts, acc_key, acc_valid, dropped


@functools.partial(jax.jit, static_argnames=("mesh", "sample_per_shard",
                                             "imbalance_threshold"))
def rebalance(
    mesh: Mesh,
    vmap_global: vm.VoxelMap,   # sharded over the point axis (key-range blocks)
    split_keys: jax.Array,      # [S-1] current boundaries (replicated)
    sample_per_shard: int = 512,
    imbalance_threshold: float = 1.5,
) -> tuple[vm.VoxelMap, jax.Array, jax.Array]:
    """Occupancy rebalancing (docs/DESIGN-map-sharding.md): when the fullest
    shard exceeds ``imbalance_threshold`` x the mean occupancy, recompute the
    key-range boundaries as weighted quantiles of a strided sample of
    resident keys (one all_gather of [S, sample_per_shard] int32) and
    redistribute rows with a ring ``ppermute`` pass: each shard keeps an
    accumulator of its local capacity, absorbing the rows it owns from every
    visiting block (hash-ordered truncation on overflow, same policy as
    `voxmap.insert`).

    Below the threshold the boundaries are kept and the ring pass is an
    identity, so the call is safe to make unconditionally every K frames.

    Returns (new map, new split_keys, dropped row count).
    """
    n_shards = mesh.shape[sharding.POINT_AXIS]

    def body(points_l, key_l, valid_l, splits):
        me = jax.lax.axis_index(sharding.POINT_AXIS)
        cnt = jnp.sum(valid_l).astype(jnp.int32)
        counts = jax.lax.all_gather(cnt, sharding.POINT_AXIS)      # [S]
        total = jnp.sum(counts)
        mean_occ = total.astype(jnp.float32) / n_shards
        need = (counts.max().astype(jnp.float32)
                > imbalance_threshold * jnp.maximum(mean_occ, 1.0)) & (total > 0)

        # --- weighted key sample -> quantile boundaries (deterministic: every
        # shard computes the same splits from the same gathered sample)
        m = sample_per_shard
        # local table is key-sorted with valid rows first: a strided index
        # over the first `cnt` rows is a uniform sample of resident keys
        idx = (jnp.arange(m, dtype=jnp.int32) * jnp.maximum(cnt, 1)) // m
        samp = jnp.where(cnt > 0, key_l[idx], jnp.int32(_KEY_SPACE))
        w = jnp.where(cnt > 0, cnt.astype(jnp.float32) / m, 0.0)
        samp_all = jax.lax.all_gather(samp, sharding.POINT_AXIS).reshape(-1)
        w_all = jnp.repeat(jax.lax.all_gather(w, sharding.POINT_AXIS), m)
        order = jnp.argsort(samp_all)
        sk, sw = samp_all[order], w_all[order]
        cum = jnp.cumsum(sw)
        targets = jnp.arange(1, n_shards, dtype=jnp.float32) * (
            total.astype(jnp.float32) / n_shards
        )
        pos = jnp.clip(jnp.searchsorted(cum, targets, side="left"),
                       0, sk.shape[0] - 1)
        # boundary *after* the quantile key so equal keys stay together
        new_splits = jax.lax.cummax(sk[pos] + 1)
        new_splits = jnp.where(need, new_splits, splits)

        # --- ring redistribution under the (possibly new) boundaries
        acc_pts, acc_key, acc_valid, dropped = _ring_redistribute(
            points_l, key_l, valid_l, new_splits, me, n_shards)
        return (acc_pts, acc_key, acc_valid, new_splits,
                jax.lax.psum(dropped, sharding.POINT_AXIS))

    pts, key, valid, new_splits, dropped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS),
                  P(sharding.POINT_AXIS), P(None)),
        out_specs=(P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS),
                   P(sharding.POINT_AXIS), P(None), P()),
        check_vma=False,
    )(vmap_global.points, vmap_global.key, vmap_global.valid, split_keys)
    return vm.VoxelMap(pts, key, valid), new_splits, dropped


@functools.partial(jax.jit, static_argnames=("mesh", "voxel_size"))
def sharded_reanchor(
    mesh: Mesh,
    vmap_global: vm.VoxelMap,   # sharded over the point axis (key-range blocks)
    split_keys: jax.Array,      # [S-1] boundaries (replicated, unchanged)
    delta_r: jax.Array, delta_t: jax.Array,
    voxel_size: float,
) -> tuple[vm.VoxelMap, jax.Array]:
    """Rigid world-frame move of the *sharded* voxel map (pose-graph
    re-anchor, the distributed counterpart of `_reanchor_state`'s map move):
    each shard transforms its resident points, recomputes their packed keys,
    and the rows whose new key falls outside the shard's range migrate to
    their owner via the same ring ``ppermute`` pass `rebalance` uses. The
    key boundaries stay fixed — ownership changes because the KEYS moved,
    and a subsequent `rebalance` call re-levels occupancy if the move skewed
    it. Returns (new map, dropped row count).
    """
    n_shards = mesh.shape[sharding.POINT_AXIS]

    def body(points_l, key_l, valid_l, splits, dr, dt):
        me = jax.lax.axis_index(sharding.POINT_AXIS)
        pts = points_l @ dr.T + dt[None, :]
        key = jnp.where(valid_l, voxel_key(pts, voxel_size), INVALID_KEY)
        pts = jnp.where(valid_l[:, None], pts, 0.0)
        acc_pts, acc_key, acc_valid, dropped = _ring_redistribute(
            pts, key, valid_l, splits, me, n_shards)
        return (acc_pts, acc_key, acc_valid,
                jax.lax.psum(dropped, sharding.POINT_AXIS))

    pts, key, valid, dropped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS),
                  P(sharding.POINT_AXIS), P(None), P(None, None), P(None)),
        out_specs=(P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS),
                   P(sharding.POINT_AXIS), P()),
        check_vma=False,
    )(vmap_global.points, vmap_global.key, vmap_global.valid, split_keys,
      delta_r, delta_t)
    return vm.VoxelMap(pts, key, valid), dropped


def _ring_candidates(source_l, src_valid_l, blk_pts, blk_valid, k: int,
                     method: str = "bucketed"):
    """Gather K candidates from every map block via a point-axis ring, then
    keep the K globally nearest of the S*K union (one lax.top_k).

    Every block contributes a FULL K-candidate set (not K/S): the per-block
    search is one pass over the block's rows either way, so the only extra
    cost is the trivial [B, S*K] -> K top-k — and the union top-k makes the
    composed candidate set independent of HOW the map happens to be split
    into blocks, which is what replicated-vs-sharded trajectory parity needs
    (per-block K/S budgets composed candidates differently per split and
    drifted ~0.1 m over 8 frames).

    method "topk" uses the exact per-block top-K, whose union top-K IS the
    exact global KNN over all resident map points (each of the K global
    nearest is among the K nearest of its own block) — the parity anchor.
    method "bucketed" (default) uses the group-min search: blocked-cyclic
    groups (see knn.knn_candidates_bucketed) matter here because map blocks
    store residents compacted at the front of a mostly-empty padded table —
    cycling keeps all K slots populated; the union top-k then ranks S*K
    group-minima, a strictly finer approximation than one global K-group
    pass.

    Returns (cand_pts [Bl, K, 3], cand_valid [Bl, K]).
    """
    from svnicp_tpu.kernels import knn

    n_shards = jax.lax.axis_size(sharding.POINT_AXIS)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def step(carry, _):
        pts, valid, acc_pts, acc_d2, slot = carry
        if method == "topk":
            idx, d2 = knn.knn_candidates(source_l, pts, src_valid_l, valid, k)
        else:
            idx, d2 = knn.knn_candidates_bucketed(
                source_l, pts, src_valid_l, valid, k
            )
        got = pts[idx]                                        # [Bl,k,3]
        acc_pts = acc_pts.at[:, slot].set(got)
        acc_d2 = acc_d2.at[:, slot].set(d2)
        pts = jax.lax.ppermute(pts, sharding.POINT_AXIS, perm)
        valid = jax.lax.ppermute(valid, sharding.POINT_AXIS, perm)
        return (pts, valid, acc_pts, acc_d2, slot + 1), None

    bl = source_l.shape[0]
    acc_pts = jnp.zeros((bl, n_shards, k, 3), source_l.dtype)
    acc_d2 = jnp.full((bl, n_shards, k), jnp.inf, source_l.dtype)
    (_, _, acc_pts, acc_d2, _), _ = jax.lax.scan(
        step, (blk_pts, blk_valid, acc_pts, acc_d2, jnp.int32(0)),
        None, length=n_shards,
    )
    acc_pts = acc_pts.reshape(bl, n_shards * k, 3)
    acc_d2 = acc_d2.reshape(bl, n_shards * k)
    neg_top, sel = jax.lax.top_k(-acc_d2, k)                  # [Bl,k]
    cand_pts = jnp.take_along_axis(acc_pts, sel[..., None], axis=1)
    return cand_pts, jnp.isfinite(-neg_top)


def sharded_register_with_map(
    mesh: Mesh,
    cfg: SteinICPConfig,
    source: jax.Array,          # [B,3] sharded over the point axis
    src_valid: jax.Array,
    vmap_global: vm.VoxelMap,   # sharded over the point axis (key-range blocks)
    r0: jax.Array, t0: jax.Array,
    init_particles: jax.Array,  # [P,6] sharded over the particle axis
    history: bool = False,
) -> svn.AlignResult:
    """Full distributed registration against the *sharded* map: ring-gather
    candidates from all map blocks (full-K per block + union top-k, so the
    candidate set is split-independent — exact global KNN under
    candidate_method "topk"), then the mesh-parallel SVN loop. history=True
    additionally returns the [iters,P,6] particle stack (sharded
    save_particles — sharding.run_align_loop)."""

    def body(source_l, src_valid_l, map_pts_l, map_key_l, map_valid_l,
             r0_l, t0_l, init_l):
        source_at_guess = geo.transform_points(r0_l, t0_l, source_l)
        cand_pts, cand_valid = _ring_candidates(
            source_at_guess, src_valid_l, map_pts_l, map_valid_l,
            cfg.knn_count, method=cfg.candidate_method,
        )
        feat, bias = svn.correspondence_features(source_l, cand_pts, cand_valid)
        normals = None
        if cfg.residual == "point_to_plane":
            from svnicp_tpu.core import residuals as res_mod

            normals = res_mod.plane_normals(cand_pts, cand_valid)
        r = geo.bso3_exp(init_l[:, 3:])
        t = init_l[:, :3]

        def iter_fn(r_, t_):
            return sharding._sharded_iteration(
                cfg, source_l, src_valid_l, cand_pts, cand_valid, feat, bias,
                normals, None, r0_l, t0_l, r_, t_,
            )

        (r_f, t_f, it, gn, _), hist = sharding.run_align_loop(
            cfg, iter_fn, r, t,
            sharding._degenerate_global(src_valid_l, cand_valid), history)

        coords = jnp.concatenate([t_f, geo.bso3_log(r_f)], axis=-1)
        particles = jax.lax.all_gather(coords, sharding.PARTICLE_AXIS, tiled=True)
        p = particles.shape[0]
        weights = jnp.full((p,), 1.0 / p, particles.dtype)
        mean = jnp.mean(particles, axis=0)
        centered = particles - mean[None, :]
        var = jnp.mean(centered * centered, axis=0)
        cov = jnp.einsum("pi,pj->ij", centered, centered) / p
        result = svn.AlignResult(particles, weights, mean, var, cov, it, gn)
        return (result, hist) if history else result

    result_specs = svn.AlignResult(
        particles=P(None, None), weights=P(None), mean=P(None),
        var=P(None), cov=P(None, None), iterations=P(), grad_norm=P(),
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS),
            P(sharding.POINT_AXIS, None), P(sharding.POINT_AXIS), P(sharding.POINT_AXIS),
            P(None, None), P(None), P(sharding.PARTICLE_AXIS, None),
        ),
        out_specs=((result_specs, P(None, None, None)) if history
                   else result_specs),
        check_vma=False,
    )
    return fn(source, src_valid, vmap_global.points, vmap_global.key,
              vmap_global.valid, r0, t0, init_particles)
