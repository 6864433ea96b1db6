"""Nearest-neighbor search: jnp reference implementations (the test oracle).

TPU-native replacement for the reference's vendored PyTorch3D brute-force
CUDA KNN (ref: svn-icp/src/core/knn/knn.cu:28-459 + the MinK streaming top-K
tracker in include/core/utils/mink.cuh:41-165). Two call sites exist in the
reference and both are reproduced here with identical semantics:

1. scan-level candidate search — K nearest map points per source point,
   done once per frame (ref: SVGDICP.cpp:201-215, K=100);
2. per-iteration per-particle 1-NN among those K candidates
   (ref: SVGDICP.cpp:300-329).

Everything is fixed-shape and mask-aware: invalid points carry +inf distance
so padded entries never win. `svnicp_tpu.kernels.knn_pallas` provides the
fused Pallas TPU kernels; these jnp versions are the oracle they are tested
against (mirroring the reference's CPU fallback knn_cpu.cpp:13-69).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.inf


def _sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances [N,3] x [M,3] -> [N,M].

    Uses the MXU-friendly |a|^2 - 2 a.b + |b|^2 expansion; the dominant cost
    is one [N,3]x[3,M] matmul.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)
    ab = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 - 2.0 * ab + b2[None, :], 0.0)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_candidates(
    source: jax.Array,        # [Ns,3]
    target: jax.Array,        # [Nt,3]
    source_valid: jax.Array,  # [Ns] bool
    target_valid: jax.Array,  # [Nt] bool
    k: int,
    chunk: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """K nearest valid targets per source point.

    Returns (indices [Ns,k] int32, sq_dists [Ns,k] f32). Invalid targets are
    pushed to +inf so they only appear when fewer than k valid targets exist;
    callers must combine with `sq_dists < inf` style masks.

    Memory-bounded: streams the target in `chunk`-sized tiles with a running
    top-k merge (the XLA analogue of the reference's MinK register tracker).
    """
    ns, nt = source.shape[0], target.shape[0]
    pad = (-nt) % chunk
    if pad:
        target = jnp.concatenate([target, jnp.zeros((pad, 3), target.dtype)], axis=0)
        target_valid = jnp.concatenate(
            [target_valid, jnp.zeros((pad,), bool)], axis=0
        )
    n_chunks = target.shape[0] // chunk
    tgt_tiles = target.reshape(n_chunks, chunk, 3)
    val_tiles = target_valid.reshape(n_chunks, chunk)

    init_d = jnp.full((ns, k), _INF, dtype=source.dtype)
    init_i = jnp.zeros((ns, k), dtype=jnp.int32)

    def body(carry, tile):
        best_d, best_i = carry
        pts, valid, base = tile
        d = _sq_dists(source, pts)
        d = jnp.where(valid[None, :], d, _INF)
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (ns, chunk), 1)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_d, best_i), _ = jax.lax.scan(body, (init_d, init_i), (tgt_tiles, val_tiles, bases))
    best_d = jnp.where(source_valid[:, None], best_d, _INF)
    return best_i, best_d


def bucket_block_size(nt: int, k: int) -> int:
    """Block size of the blocked-cyclic bucket grouping (shared by the jnp
    oracle and the Pallas kernel — they MUST agree for bit parity): the
    largest power of two <= 128 that still deals >= 4 blocks to every slot,
    floored at 8. 128 >> any per-voxel run (max_points_per_voxel <= ~20);
    >= 4 blocks per slot keeps slots populated on short valid prefixes."""
    b = 8
    while b < 128 and (b * 2) * k * 4 <= max(nt, 1):
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("k",))
def knn_candidates_bucketed(
    source: jax.Array,        # [Ns,3]
    target: jax.Array,        # [Nt,3]
    source_valid: jax.Array,  # [Ns]
    target_valid: jax.Array,  # [Nt]
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Approximate K-nearest candidates via per-group minima — the TPU-fast
    stage-1 search (drop-in for `knn_candidates`).

    The target is split into k BLOCKED-CYCLIC groups: contiguous blocks of
    `bucket_block_size(nt, k)` rows are dealt round-robin to the k slots
    (row i -> slot (i // blk) % k). Each source point takes the nearest
    target of every slot. The block structure matters on both ends:
    - blocks are larger than a per-voxel point run (hash-compacted tables
      keep same-key rows ADJACENT — stable sort on hash(key)), so one
      voxel's points land in 1-2 slots instead of filling most of them
      (pure striding measured 3x the align iterations: candidate sets
      collapsed onto the single nearest voxel and plane fits degenerated);
    - cycling keeps every slot populated even when the valid rows sit
      compacted at the front of a mostly-empty padded table (map blocks,
      sparse radius extracts) — pure contiguous k-way chunks would put all
      residents in the first slots and starve the rest.
    With hash-ordered targets the slots are spatially random, so the result
    approximates the true top-k while the *global* 1-NN is exactly included
    (it is its own slot's minimum). Cost: one [Ns,3]x[3,Nt] matmul +
    row-group min — no sort, no top_k, no [Ns,Nt] materialization pressure
    beyond one pass.

    The candidate set's only job is to cover the per-iteration 1-NN of points
    under the ICP perturbations (ref two-stage scheme, SVGDICP.cpp:176-215);
    group-min candidates are nearest-biased exactly like true top-k.

    Returns (indices [Ns,k], sq_dists [Ns,k]) with +inf for invalid slots.
    """
    ns, nt = source.shape[0], target.shape[0]
    blk = bucket_block_size(nt, k)
    pad = (-nt) % (k * blk)
    if pad:
        target = jnp.concatenate([target, jnp.zeros((pad, 3), target.dtype)], axis=0)
        target_valid = jnp.concatenate([target_valid, jnp.zeros((pad,), bool)], axis=0)
    nt_p = target.shape[0]
    group = nt_p // k
    n_outer = group // blk           # blocks dealt to each slot

    # ranking score: |t|^2 - 2 s.t  (|s|^2 is constant per row)
    t2 = jnp.sum(target * target, axis=-1)
    cross = jnp.matmul(source, target.T, precision=jax.lax.Precision.HIGHEST)
    score = t2[None, :] - 2.0 * cross
    score = jnp.where(target_valid[None, :], score, _INF)
    # blocked-cyclic grouping: row i = (o*k + c)*blk + j lands in slot c
    score = jnp.moveaxis(score.reshape(ns, n_outer, k, blk), 2, 1)   # [Ns,k,o,j]
    score = score.reshape(ns, k, group)
    within = jnp.argmin(score, axis=-1).astype(jnp.int32)            # [Ns,k]
    slot_c = jnp.arange(k, dtype=jnp.int32)[None, :]
    idx = ((within // blk) * k + slot_c) * blk + within % blk
    # exact squared distances for the selected candidates
    s2 = jnp.sum(source * source, axis=-1, keepdims=True)
    best_score = jnp.take_along_axis(score, within[..., None], axis=-1)[..., 0]
    d2 = jnp.maximum(best_score + s2, 0.0)
    d2 = jnp.where(jnp.isfinite(best_score), d2, _INF)
    d2 = jnp.where(source_valid[:, None], d2, _INF)
    return idx, d2


def nn_among_candidates(
    transformed: jax.Array,   # [P,B,3] per-particle transformed source points
    cand_pts: jax.Array,      # [B,K,3] candidate target points per source point
    cand_valid: jax.Array,    # [B,K] bool
) -> tuple[jax.Array, jax.Array]:
    """Per-particle 1-NN among per-point candidate sets.

    Returns (idx [P,B] int32 into K, sq_dist [P,B]). This is the per-iteration
    hot op (ref: SVGDICP.cpp:300-329 calls the CUDA KNN with batch=B,
    p1=[B,P,3], p2=[B,K,3], K=1).
    """
    # d2[p,b,k] = |T_p s_b - c_{b,k}|^2, expanded so the cross term is a
    # batched matmul [B,P,3]x[B,3,K] the MXU can tile.
    t2 = jnp.sum(transformed * transformed, axis=-1)            # [P,B]
    c2 = jnp.sum(cand_pts * cand_pts, axis=-1)                  # [B,K]
    cross = jnp.einsum(
        "pbd,bkd->pbk", transformed, cand_pts, precision=jax.lax.Precision.HIGHEST
    )
    d2 = t2[..., None] - 2.0 * cross + c2[None]                 # [P,B,K]
    d2 = jnp.where(cand_valid[None], d2, _INF)
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    best = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
    return idx, best


def find_candidates(cfg, source_at_guess, target, source_valid, target_valid):
    """Stage-1 candidate search honoring cfg.candidate_method."""
    if cfg.candidate_method == "topk":
        return knn_candidates(source_at_guess, target, source_valid, target_valid,
                              cfg.knn_count)
    return knn_candidates_bucketed(source_at_guess, target, source_valid,
                                   target_valid, cfg.knn_count)


def find_candidate_points(cfg, source_at_guess, target, source_valid,
                          target_valid):
    """Stage-1 candidates as POINTS (cand_pts [B,K,3], cand_valid [B,K]).

    On TPU with the Pallas path enabled, the bucketed search runs as a fused
    kernel that emits the matched points directly (no [B,K,G] score in HBM,
    no random gather — see nn_pallas.bucketed_candidates); otherwise falls
    back to find_candidates + gather_candidates.
    """
    if cfg.candidate_method == "bucketed" and cfg.use_pallas:
        from svnicp_tpu.kernels import nn_pallas

        if nn_pallas.pallas_ok():
            pts, d2 = nn_pallas.bucketed_candidates(
                source_at_guess, target, source_valid, target_valid,
                cfg.knn_count,
            )
            return pts, jnp.isfinite(d2)
    idx, d2 = find_candidates(cfg, source_at_guess, target, source_valid,
                              target_valid)
    return gather_candidates(target, idx, d2)


def gather_candidates(
    target: jax.Array,       # [Nt,3]
    cand_idx: jax.Array,     # [B,K]
    cand_d2: jax.Array,      # [B,K]
) -> tuple[jax.Array, jax.Array]:
    """Materialize candidate points [B,K,3] + validity [B,K] from indices."""
    pts = target[cand_idx]
    valid = jnp.isfinite(cand_d2)
    return pts, valid
