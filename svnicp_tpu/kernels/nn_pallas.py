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
- feat is passed TRANSPOSED as [12, B*K] ([13, B*K] with the bias folded in
  for `fused_moments`);
- candidates are passed as [B, 3, K] ([B, 4, K] with an all-ones hit-count
  channel for `fused_moments`);
- the matched output comes back as [3, P, B] (transpose once outside).
K sits on the LANE axis in these kernels, so it must be a multiple of 128
(pad with bias=+inf slots via `pad_candidates`); the point-to-plane path
instead uses the K-on-SUBLANE kernel `fused_moments_plane_kb`, which runs
at true K (any multiple of 8 — see its docstring).
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


def fused_moments(
    params: jax.Array,        # [P,12]
    feat: jax.Array,          # [B*K,12]
    bias: jax.Array,          # [B,K] (+inf at invalid slots)
    cand_pts: jax.Array,      # [B,K,3]
    source: jax.Array,        # [B,3]
    src_valid: jax.Array,     # [B] bool
    max_dist: float,
    particle_tile: int = 64,
    point_tile: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One fused pass: per-particle H [P,6,6] and b [P,6] straight from the
    candidate sets — no [P,B,*] intermediate ever touches HBM. Convenience
    wrapper over the K-on-sublane kernel (tests / one-shot callers; the
    align loop calls the split prepare/run form)."""
    prep = prepare_moments_kb(feat, bias, cand_pts, source, src_valid)
    return fused_moments_kb(params, *prep, max_dist,
                            particle_tile=particle_tile,
                            point_tile=point_tile, interpret=interpret)


def fused_moments_plane(
    params: jax.Array,        # [P,12]
    feat: jax.Array,          # [B*K,12]
    bias: jax.Array,          # [B,K] (+inf at invalid slots)
    cand_pts: jax.Array,      # [B,K,3]
    source: jax.Array,        # [B,3]
    normals: jax.Array,       # [B,3] unit plane normals (residuals.plane_normals)
    valid: jax.Array,         # [B] bool: src_valid & plane_valid
    max_dist: float,
    particle_tile: int = 64,
    point_tile: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused point-to-plane pass: H [P,6,6], b [P,6] straight from the
    candidate sets (plane analogue of `fused_moments`). Convenience wrapper
    over the K-on-sublane kernel (tests / one-shot callers)."""
    prep = prepare_moments_plane_kb(feat, bias, cand_pts, source, normals,
                                    valid)
    return fused_moments_plane_kb(params, *prep, max_dist,
                                  particle_tile=particle_tile,
                                  point_tile=point_tile, interpret=interpret)


def _moments_kernel_kb(max_dist_ref, params_ref, feat_kb_ref, cand_kb_ref,
                       src_t_ref, valid_ref, mom_ref):
    """Point-to-point moments with K on SUBLANES (see
    `_plane_moments_kernel_kb` for the layout rationale): the score tensor
    is [Pt,K,Bt] at TRUE K (multiple of 8), the K-reduction is a cross-
    sublane min, and the matched candidate is three broadcast-multiply
    sublane sums — no one-hot matmul, no transposes.

    Output mom[n_j, 32, P]: row 0 = sum of robust weights, rows 1..3 = m1,
    4..12 = m2 row-major, 13..15 = b_t, 16..18 = b_r, rest zero pad —
    the block moments that assemble H and b (core/residuals.py identity).
    """
    pt = params_ref.shape[0]
    _, k, bt = cand_kb_ref.shape
    max_dist = max_dist_ref[0]

    score = jax.lax.dot_general(
        params_ref[:], feat_kb_ref[:].reshape(13, k * bt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(pt, k, bt)
    best = jnp.min(score, axis=1)                              # [Pt,Bt]
    hit = (score == best[:, None, :]).astype(jnp.float32)      # [Pt,K,Bt]
    cnt = jnp.sum(hit, axis=1)
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    matched = [jnp.sum(hit * cand_kb_ref[c][None], axis=1) * inv
               for c in range(3)]                              # 3 x [Pt,Bt]

    src_rows = [src_t_ref[j, :] for j in range(3)]             # 3 x [Bt]
    transformed = [
        params_ref[:, 3 * i + 0][:, None] * src_rows[0][None, :]
        + params_ref[:, 3 * i + 1][:, None] * src_rows[1][None, :]
        + params_ref[:, 3 * i + 2][:, None] * src_rows[2][None, :]
        + params_ref[:, 9 + i][:, None]
        for i in range(3)
    ]                                                          # 3 x [Pt,Bt]
    t2 = (transformed[0] * transformed[0] + transformed[1] * transformed[1]
          + transformed[2] * transformed[2])
    d2 = jnp.maximum(best + t2, 0.0)
    gate = ((d2 < max_dist) & (best < jnp.float32(1e30))).astype(jnp.float32)

    e = [(transformed[i] - matched[i]) * gate for i in range(3)]
    en = jnp.sqrt(e[0] * e[0] + e[1] * e[1] + e[2] * e[2])
    w = (max_dist / (max_dist + 3.0 * en)) ** 2                # gated pts: w=1
    w = w * valid_ref[:].reshape(1, bt)                        # padding: w=0
    we = [w * e[i] for i in range(3)]

    s_g = [src_rows[i][None, :] * gate for i in range(3)]      # 3 x [Pt,Bt]
    rcol = [[params_ref[:, 3 * i + j] for j in range(3)] for i in range(3)]
    rte = [
        rcol[0][j][:, None] * we[0]
        + rcol[1][j][:, None] * we[1]
        + rcol[2][j][:, None] * we[2]
        for j in range(3)
    ]                                                          # R^T (w e)

    s0, s1, s2 = s_g
    comps = [jnp.sum(w, axis=1)]                               # sw
    comps += [jnp.sum(w * s_g[i], axis=1) for i in range(3)]   # m1
    comps += [jnp.sum(w * s_g[i] * s_g[j], axis=1)
              for i in range(3) for j in range(3)]             # m2
    comps += [jnp.sum(rte[j], axis=1) for j in range(3)]       # b_t
    comps += [                                                 # b_r
        jnp.sum(s1 * rte[2] - s2 * rte[1], axis=1),
        jnp.sum(s2 * rte[0] - s0 * rte[2], axis=1),
        jnp.sum(s0 * rte[1] - s1 * rte[0], axis=1),
    ]
    zero = jnp.zeros((pt,), jnp.float32)
    comps += [zero] * (32 - len(comps))
    mom_ref[:] = jnp.stack(comps, axis=0)[None]                # [1,32,Pt]


@jax.jit
def prepare_moments_kb(feat, bias, cand_pts, source, src_valid):
    """Loop-invariant prep for `fused_moments_kb` (K-on-sublane layout).

    XLA does NOT hoist operand-shaping ops across the Pallas custom-call
    boundary out of the align while_loop (measured ~1.3 ms/frame of
    re-running candidate prep at bench shapes), so callers compute this
    ONCE per frame and pass the prepared tensors through the loop.
    """
    b, k = bias.shape
    feat13 = jnp.concatenate([-2.0 * feat.reshape(b, k, 12),
                              bias[..., None]], axis=-1)       # [B,K,13]
    feat13_kb = jnp.transpose(feat13, (2, 1, 0))               # [13,K,B]
    cand_kb = jnp.transpose(cand_pts, (2, 1, 0))               # [3,K,B]
    src_t = source.T
    vmask = src_valid.astype(jnp.float32).reshape(1, b)
    return feat13_kb, cand_kb, src_t, vmask


@functools.partial(jax.jit, static_argnames=("particle_tile", "point_tile", "interpret"))
def fused_moments_kb(
    params: jax.Array,        # [P,12]
    feat13_kb: jax.Array,     # [13,K,B]
    cand_kb: jax.Array,       # [3,K,B]
    src_t: jax.Array,         # [3,B]
    vmask: jax.Array,         # [1,B] f32
    max_dist: float,
    particle_tile: int = 64,
    point_tile: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused point-to-point pass at TRUE K (multiple of 8): H [P,6,6] and
    b [P,6] straight from the candidate sets — no [P,B,*] intermediate ever
    touches HBM. Replaces the lane-axis kernel for the reference-parity
    K=100 path (100 -> 104 sublane pad instead of 128 lanes, no one-hot
    matmul or transposes)."""
    p = params.shape[0]
    _, k, b = cand_kb.shape
    assert k % 8 == 0 or interpret, f"K must be a multiple of 8, got {k}"
    assert p % particle_tile == 0 and b % point_tile == 0
    # free [pt,K*bt]->[pt,K,bt] split needs a 128-multiple lane tile
    assert point_tile % 128 == 0 or interpret, point_tile
    assert particle_tile == p or particle_tile % 128 == 0, particle_tile

    params13 = jnp.concatenate(
        [params, jnp.ones((p, 1), params.dtype)], axis=-1)
    md = jnp.asarray([max_dist], jnp.float32)

    n_j = b // point_tile
    grid = (p // particle_tile, n_j)
    moments = pl.pallas_call(
        _moments_kernel_kb,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((particle_tile, 13), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((13, k, point_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, point_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, point_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, point_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, particle_tile), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_j, 32, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(md, params13, feat13_kb, cand_kb, src_t, vmask)

    m = jnp.sum(moments, axis=0).T                             # [P,32]
    sw, m1 = m[:, 0], m[:, 1:4]
    m2 = m[:, 4:13].reshape(p, 3, 3)
    b_t, b_r = m[:, 13:16], m[:, 16:19]

    eye = jnp.eye(3, dtype=jnp.float32)
    sk = _skew_batch(m1)
    h_tt = sw[:, None, None] * eye[None]
    h_rr = jnp.trace(m2, axis1=1, axis2=2)[:, None, None] * eye[None] - m2
    top = jnp.concatenate([h_tt, -sk], axis=2)
    bot = jnp.concatenate([sk, h_rr], axis=2)
    h = jnp.concatenate([top, bot], axis=1) + 1e-6 * jnp.eye(6, dtype=jnp.float32)
    bvec = jnp.concatenate([b_t, b_r], axis=1)
    return h, bvec


def _plane_moments_kernel_kb(max_dist_ref, params_ref, feat_kb_ref, ndotc_ref,
                             src_t_ref, nrm_t_ref, valid_ref, mom_ref):
    """Point-to-plane moments with K on SUBLANES (points on lanes).

    The `_plane_moments_kernel` layout puts K on the 128-wide lane axis, so
    K=32 (the flagship operating point) is lane-padded 4x and every pass
    over the [Pt,Bt,K] score chain does 4x the work. Here the score tensor
    is [Pt,K,Bt]: points ride the lanes at full width, K rides sublanes at
    its true size (any multiple of 8), the K-reduction is a cheap
    cross-sublane min, and the matched n.q needs no one-hot matmul or
    transpose — just a broadcast multiply + sublane sum.
    """
    pt = params_ref.shape[0]
    k, bt = ndotc_ref.shape
    max_dist = max_dist_ref[0]

    score = jax.lax.dot_general(
        params_ref[:], feat_kb_ref[:].reshape(13, k * bt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(pt, k, bt)
    best = jnp.min(score, axis=1)                              # [Pt,Bt]
    hit = (score == best[:, None, :]).astype(jnp.float32)      # [Pt,K,Bt]
    cnt = jnp.sum(hit, axis=1)                                 # [Pt,Bt]
    nqs = jnp.sum(hit * ndotc_ref[:][None], axis=1)
    nq = nqs / jnp.maximum(cnt, 1.0)                           # n.q* (tie-avg)

    src_rows = [src_t_ref[j, :] for j in range(3)]             # 3 x [Bt]
    nrm_rows = [nrm_t_ref[j, :] for j in range(3)]
    # |T s|^2 without materializing [Pt,3,Bt]: accumulate per component
    t2 = jnp.zeros((pt, bt), jnp.float32)
    for i in range(3):
        ti = (params_ref[:, 3 * i + 0][:, None] * src_rows[0][None, :]
              + params_ref[:, 3 * i + 1][:, None] * src_rows[1][None, :]
              + params_ref[:, 3 * i + 2][:, None] * src_rows[2][None, :]
              + params_ref[:, 9 + i][:, None])
        t2 = t2 + ti * ti
    d2 = jnp.maximum(best + t2, 0.0)
    gate = ((d2 < max_dist) & (best < jnp.float32(1e30))).astype(jnp.float32)

    u = [
        params_ref[:, 0 + j][:, None] * nrm_rows[0][None, :]
        + params_ref[:, 3 + j][:, None] * nrm_rows[1][None, :]
        + params_ref[:, 6 + j][:, None] * nrm_rows[2][None, :]
        for j in range(3)
    ]                                                          # 3 x [Pt,Bt]
    nts = (u[0] * src_rows[0][None, :] + u[1] * src_rows[1][None, :]
           + u[2] * src_rows[2][None, :])
    ntt = (params_ref[:, 9][:, None] * nrm_rows[0][None, :]
           + params_ref[:, 10][:, None] * nrm_rows[1][None, :]
           + params_ref[:, 11][:, None] * nrm_rows[2][None, :])
    r = nts + ntt - nq
    w = (max_dist / (max_dist + 3.0 * jnp.abs(r))) ** 2
    w = w * gate * valid_ref[:].reshape(1, bt)
    wr = w * r

    s0, s1, s2 = (src_rows[0][None, :], src_rows[1][None, :],
                  src_rows[2][None, :])
    g = [
        u[0], u[1], u[2],
        s1 * u[2] - s2 * u[1],                                 # s x u
        s2 * u[0] - s0 * u[2],
        s0 * u[1] - s1 * u[0],
    ]
    comps = [jnp.sum(w * g[i] * g[j], axis=1)
             for i in range(6) for j in range(i, 6)]           # 21 H entries
    comps += [jnp.sum(wr * g[i], axis=1) for i in range(6)]    # b
    zero = jnp.zeros((pt,), jnp.float32)
    comps += [zero] * (32 - len(comps))
    mom_ref[:] = jnp.stack(comps, axis=0)[None]                # [1,32,Pt]


@jax.jit
def prepare_moments_plane_kb(feat, bias, cand_pts, source, normals, valid):
    """Loop-invariant prep for `fused_moments_plane_kb` (K-on-sublane
    layout): features and n.c go K-major so each point tile is contiguous."""
    b, k = bias.shape
    feat13 = jnp.concatenate([-2.0 * feat.reshape(b, k, 12),
                              bias[..., None]], axis=-1)       # [B,K,13]
    feat13_kb = jnp.transpose(feat13, (2, 1, 0))               # [13,K,B]
    ndotc = jnp.einsum("bkd,bd->kb", cand_pts, normals,
                       precision=jax.lax.Precision.HIGHEST)    # [K,B]
    src_t = source.T
    nrm_t = normals.T
    vmask = valid.astype(jnp.float32).reshape(1, b)
    return feat13_kb, ndotc, src_t, nrm_t, vmask


@functools.partial(jax.jit, static_argnames=("particle_tile", "point_tile", "interpret"))
def fused_moments_plane_kb(
    params: jax.Array,        # [P,12]
    feat13_kb: jax.Array,     # [13,K,B]
    ndotc: jax.Array,         # [K,B]
    src_t: jax.Array,         # [3,B]
    nrm_t: jax.Array,         # [3,B]
    vmask: jax.Array,         # [1,B] f32
    max_dist: float,
    particle_tile: int = 64,
    point_tile: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused point-to-plane pass at TRUE K (multiple of 8, no 128 lane pad):
    H [P,6,6], b [P,6] straight from the candidate sets. Same math as
    `fused_moments_plane` — see `_plane_moments_kernel_kb` for the layout."""
    p = params.shape[0]
    k, b = ndotc.shape
    assert k % 8 == 0 or interpret, f"K must be a multiple of 8, got {k}"
    assert p % particle_tile == 0 and b % point_tile == 0
    # free [pt,K*bt]->[pt,K,bt] split needs a 128-multiple lane tile
    assert point_tile % 128 == 0 or interpret, point_tile
    assert particle_tile == p or particle_tile % 128 == 0, particle_tile

    params13 = jnp.concatenate(
        [params, jnp.ones((p, 1), params.dtype)], axis=-1)
    md = jnp.asarray([max_dist], jnp.float32)

    n_j = b // point_tile
    grid = (p // particle_tile, n_j)
    moments = pl.pallas_call(
        _plane_moments_kernel_kb,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((particle_tile, 13), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((13, k, point_tile), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, point_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, point_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, point_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, point_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 32, particle_tile), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_j, 32, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(md, params13, feat13_kb, ndotc, src_t, nrm_t, vmask)

    m = jnp.sum(moments, axis=0).T                             # [P,32]
    iu, ju = jnp.triu_indices(6)
    h = jnp.zeros((p, 6, 6), jnp.float32)
    h = h.at[:, iu, ju].set(m[:, :21])
    h = h.at[:, ju, iu].set(m[:, :21])                         # symmetric fill
    h = h + 1e-6 * jnp.eye(6, dtype=jnp.float32)
    bvec = m[:, 21:27]
    return h, bvec


def _pick_point_tile_kb(ptile: int, bsz: int, k: int, channels: int) -> int:
    """Point tile for the K-on-sublane moments kernels: the live VMEM
    residents are the score/hit pair (2*pt*k*bt f32) plus the double-
    buffered streamed [*,k,bt] inputs (`channels` = 13 feat + 1 ndotc for
    the plane kernel, 13 + 3 candidate coords for p2p). The kernels request
    a 64 MB scoped-vmem limit (v5e has 128 MB physical) so estimate drift
    cannot OOM, but smaller tiles pipeline better — the 11 MB budget is a
    deliberate tile cap, not a hardware ceiling (measured on the lane-axis
    predecessor: bt=128 beat bt=256 at the K=128 bench shape). Tiles must
    be 128-multiples (free minor-dim split in the kernel)."""
    for bt in (512, 256, 128):
        if bsz % bt:
            continue
        est = 4 * (2 * ptile * k * bt + 2 * channels * k * bt + 10 * ptile * bt)
        if est <= 11 * 1024 * 1024:
            return bt
    return 128 if bsz % 128 == 0 else bsz


def fused_moments_dispatch(params, prep, plane: bool, max_dist: float,
                           interpret: bool = False):
    """Run the right K-on-sublane moments kernel for `prep` (the tuple from
    prepare_moments_kb / prepare_moments_plane_kb) with tile sizes picked
    for the caller's shapes. Single dispatch point shared by the single-
    device align loop and the sharded per-shard loop — the prep tuple
    layouts live only here."""
    p = params.shape[0]
    if plane:
        k, bsz = prep[1].shape          # ndotc [K,B]
        channels = 14
    else:
        _, k, bsz = prep[1].shape       # cand_kb [3,K,B]
        channels = 16
    # particles sit on the output lane axis: tile = full P (or a
    # 128-multiple for very large ensembles)
    ptile = p if p <= 128 else next((d for d in (256, 128) if p % d == 0), p)
    btile = _pick_point_tile_kb(ptile, bsz, k, channels)
    fn = fused_moments_plane_kb if plane else fused_moments_kb
    return fn(params, *prep, max_dist, particle_tile=ptile, point_tile=btile,
              interpret=interpret)


def pallas_ok() -> bool:
    """Pallas kernels compile only on TPU; interpret-mode tests opt in via
    SVNICP_PALLAS_INTERPRET=1 (with pltpu.force_tpu_interpret_mode)."""
    import os

    return (
        jax.default_backend() == "tpu"
        or os.environ.get("SVNICP_PALLAS_INTERPRET") == "1"
    )


def _stage1_kernel(src_ref, tgt4_ref, out_ref):
    """One (group, source-tile) block of the bucketed candidate search.

    score = |c|^2 - 2 <s, c> over the group's targets, min over the group,
    and the argmin POINT extracted by a one-hot MXU contraction — the whole
    score tile lives only in VMEM, and no random HBM gather ever happens
    (TPU gathers are the dominant cost of the XLA path: 4.1 ms/frame of
    [B*K,3] gather at bench shapes, vs ~0 here).
    """
    s = src_ref[:]                                      # [Bt,3]
    tgt = tgt4_ref[0]                                   # [4,Gp] xyz + bias
    cross = jax.lax.dot_general(
        s, tgt[:3, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [Bt,Gp]
    score = tgt[3, :][None, :] - 2.0 * cross
    best = jnp.min(score, axis=-1)                      # [Bt]
    hit = ((score == best[:, None]) & (score < jnp.float32(1e30))
           ).astype(jnp.float32)
    cnt = jnp.sum(hit, axis=-1)                         # [Bt]
    picked = jax.lax.dot_general(
        hit, tgt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [Bt,4]
    inv = 1.0 / jnp.maximum(cnt, 1.0)
    out = jnp.concatenate(
        [jnp.transpose(picked[:, :3]) * inv[None, :], best[None, :]], axis=0
    )                                                   # [4,Bt]
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("k", "point_tile", "interpret"))
def bucketed_candidates(
    source: jax.Array,        # [B,3] source points (already at the guess)
    target: jax.Array,        # [Nt,3] map points, hash-ordered
    source_valid: jax.Array,  # [B] bool
    target_valid: jax.Array,  # [Nt] bool
    k: int,
    point_tile: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused stage-1 candidate search (Pallas path of
    `knn.knn_candidates_bucketed`): the target is split into k
    BLOCKED-CYCLIC groups (contiguous `bucket_block_size` blocks dealt
    round-robin to slots, matching the jnp oracle — see its docstring for
    why neither pure striding nor pure contiguous chunks work) and each
    source point takes the nearest target of every group.

    Returns (cand_pts [B,k,3], cand_d2 [B,k] with +inf at invalid slots) —
    candidate POINTS directly, replacing the index+gather contract of the
    XLA path. Tie-break divergence (documented): equidistant within-group
    minima are averaged here (one-hot normalization) where the XLA argmin
    picks the first — measure-zero for real clouds.
    """
    from svnicp_tpu.kernels.knn import bucket_block_size

    b = source.shape[0]
    nt = target.shape[0]
    blk = bucket_block_size(nt, k)
    pad = (-nt) % (k * blk)
    if pad:
        target = jnp.concatenate([target, jnp.zeros((pad, 3), target.dtype)], axis=0)
        target_valid = jnp.concatenate([target_valid, jnp.zeros((pad,), bool)], axis=0)
    group = target.shape[0] // k
    gp = -(-group // 128) * 128                         # lane-pad per group

    bias = jnp.where(target_valid,
                     jnp.sum(target * target, axis=-1), jnp.inf)
    tgt4 = jnp.concatenate([target, bias[:, None]], axis=1)     # [Nt_p,4]
    # blocked-cyclic groups: row (o*k + c)*blk + j -> group c
    tgt4 = jnp.transpose(tgt4.reshape(group // blk, k, blk, 4),
                         (1, 0, 2, 3)).reshape(k, group, 4)
    if gp != group:
        fill = jnp.zeros((k, gp - group, 4), tgt4.dtype).at[:, :, 3].set(jnp.inf)
        tgt4 = jnp.concatenate([tgt4, fill], axis=1)
    tgt4 = jnp.swapaxes(tgt4, 1, 2)                     # [k,4,Gp]

    bt = point_tile if b % point_tile == 0 else b
    grid = (k, b // bt)
    out = pl.pallas_call(
        _stage1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, 3), lambda g, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, gp), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, bt), lambda g, j: (g, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, 4, b), jnp.float32),
        interpret=interpret,
    )(source, tgt4)

    cand_pts = jnp.transpose(out[:, :3, :], (2, 0, 1))  # [B,k,3]
    best = out[:, 3, :].T                               # [B,k]
    s2 = jnp.sum(source * source, axis=-1, keepdims=True)
    d2 = jnp.maximum(best + s2, 0.0)
    d2 = jnp.where(best < 1e30, d2, jnp.inf)
    d2 = jnp.where(source_valid[:, None], d2, jnp.inf)
    return cand_pts, d2


def _skew_batch(v):
    zero = jnp.zeros_like(v[:, 0])
    return jnp.stack([
        jnp.stack([zero, -v[:, 2], v[:, 1]], axis=-1),
        jnp.stack([v[:, 2], zero, -v[:, 0]], axis=-1),
        jnp.stack([-v[:, 1], v[:, 0], zero], axis=-1),
    ], axis=-2)


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
    """Pad the K axis to `multiple` with invalid slots (128 for the lane-
    axis kernels, 8 for the K-on-sublane plane kernel)."""
    b, k = cand_valid.shape
    pad = (-k) % multiple
    if pad == 0:
        return cand_pts, cand_valid
    cand_pts = jnp.concatenate(
        [cand_pts, jnp.zeros((b, pad, 3), cand_pts.dtype)], axis=1
    )
    cand_valid = jnp.concatenate([cand_valid, jnp.zeros((b, pad), bool)], axis=1)
    return cand_pts, cand_valid
