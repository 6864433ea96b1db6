"""Pallas TPU kernel: fused per-iteration 1-NN among candidates.

The hot op of the SVN-ICP loop (ref: get_correspondence_fast,
svn-icp/src/core/SVGDICP.cpp:300-329, backed by the CUDA KNN knn.cu:314-459).
The XLA path materializes the [P, B*K] score tensor in HBM (~100 MB at bench
shapes) plus a separate argmin pass and candidate gather; this kernel fuses

    cross  = params @ feat               (MXU, contraction 12)
    score  = bias - 2*cross              (VPU)
    argmin over K + min                  (VPU reduction)
    matched= onehot(argmin) @ candidates (MXU, contraction K)

per (particle-tile x point-tile) block with everything in VMEM — HBM sees
only the inputs once and the outputs.

Layout contract (TPU tiling: the LAST axis is the 128-wide lane dimension,
so small feature axes must sit on sublanes to avoid 10-40x pad blowups):
- feat is passed TRANSPOSED as [12, B*K];
- candidates are passed as [B, 3, K];
- the matched output comes back as [3, P, B] (transpose once outside).
K must be a multiple of 128 (pad with bias=+inf slots via `pad_candidates`).
The jnp oracle used by the tests is the exact math the XLA path runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(params_ref, feat_t_ref, bias_ref, cand_t_ref, matched_t_ref, score_ref):
    pt = params_ref.shape[0]
    bt, k = bias_ref.shape
    cross = jax.lax.dot_general(
        params_ref[:], feat_t_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # [Pt, Bt*K]
    score = bias_ref[:].reshape(1, bt * k) - 2.0 * cross
    score = score.reshape(pt, bt, k)
    best = jnp.min(score, axis=-1)                       # [Pt, Bt]
    # one-hot of the argmin (ties resolved by even split, normalized)
    hit = (score == best[..., None]).astype(jnp.float32)
    hit = hit / jnp.maximum(jnp.sum(hit, axis=-1, keepdims=True), 1.0)
    # matched[b,p,d] = sum_k hit[p,b,k] * cand[b,d,k]  — batched MXU contract
    matched = jax.lax.dot_general(
        jnp.swapaxes(hit, 0, 1),                         # [Bt, Pt, K]
        cand_t_ref[:],                                   # [Bt, 3, K]
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                    # [Bt, Pt, 3]
    matched_t_ref[:] = jnp.transpose(matched, (2, 1, 0))  # [3, Pt, Bt]
    score_ref[:] = best


@functools.partial(jax.jit, static_argnames=("particle_tile", "point_tile", "interpret"))
def fused_nn_match(
    params: jax.Array,        # [P,12] = [vec(R_total), t_total] per particle
    feat: jax.Array,          # [B*K,12] candidate features (svn.correspondence_features)
    bias: jax.Array,          # [B,K] |c|^2 with +inf at invalid slots
    cand_pts: jax.Array,      # [B,K,3]
    particle_tile: int = 16,
    point_tile: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (matched [P,B,3], best_score [P,B]).

    best_score = |c*|^2 - 2<T_p s_b, c*>; the caller adds |T_p s_b|^2 for the
    true squared distance (constant per (p,b) — doesn't affect the argmin).
    """
    p = params.shape[0]
    b, k = bias.shape
    assert k % 128 == 0, f"K must be padded to a multiple of 128, got {k}"
    assert p % particle_tile == 0 and b % point_tile == 0, (p, b)

    feat_t = feat.T                                      # [12, B*K]
    cand_t = jnp.swapaxes(cand_pts, 1, 2)                # [B, 3, K]

    grid = (p // particle_tile, b // point_tile)
    kernel = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((particle_tile, 12), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((12, point_tile * k), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((point_tile, k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((point_tile, 3, k), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, particle_tile, point_tile), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((particle_tile, point_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, p, b), jnp.float32),
            jax.ShapeDtypeStruct((p, b), jnp.float32),
        ],
        interpret=interpret,
    )
    matched_t, best = kernel(params, feat_t, bias, cand_t)
    return jnp.transpose(matched_t, (1, 2, 0)), best


def fused_nn_match_oracle(params, feat, bias, cand_pts):
    """Pure-jnp reference (the XLA path of core/svn.py), for kernel tests."""
    p = params.shape[0]
    b, k = bias.shape
    cross = jnp.matmul(params, feat.T, precision=jax.lax.Precision.HIGHEST)
    score = (bias.reshape(1, b * k) - 2.0 * cross).reshape(p, b, k)
    idx = jnp.argmin(score, axis=-1)
    best = jnp.take_along_axis(score, idx[..., None], axis=-1)[..., 0]
    matched = cand_pts[jnp.arange(b)[None, :], idx]
    return matched, best


def pad_candidates(cand_pts, cand_valid, bias=None, multiple: int = 128):
    """Pad the K axis to a multiple of 128 with invalid (+inf bias) slots."""
    b, k = cand_valid.shape
    pad = (-k) % multiple
    if pad == 0:
        return cand_pts, cand_valid
    cand_pts = jnp.concatenate(
        [cand_pts, jnp.zeros((b, pad, 3), cand_pts.dtype)], axis=1
    )
    cand_valid = jnp.concatenate([cand_valid, jnp.zeros((b, pad), bool)], axis=1)
    return cand_pts, cand_valid
