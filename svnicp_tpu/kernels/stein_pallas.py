"""Fused ensemble-update kernel: solve + Stein coupling + pose update.

The SVN iteration's non-correspondence half — per-particle 6x6 Cholesky
solves, the RBF median-bandwidth coupling, trust-region clip, and the
right-multiplicative SE(3) pose update (ref: SVNICP.cpp:218-279) — is tiny
data ([P,6,6] + [P,6] at P<=256) but, as plain XLA, ~a hundred small ops
per iteration; a device trace attributed 1.16 ms/frame of while-body time
to them (vs 0.90 ms for the fused correspondence kernel itself,
tools/profile_step.py). This module packs that half into ONE Pallas
program, VMEM-resident end to end.

Design notes:
- The body (`stein_body`) is plain jnp, shared verbatim between the Pallas
  kernel, the interpret-mode tests, and any caller that wants the XLA
  fallback — kernel-vs-oracle parity is by construction (same trace).
- The reference's bandwidth is the *lower median* of all P^2 pairwise
  squared distances (SVNICP.cpp:262, torch lower-median semantics —
  core/svn.py median_bandwidth). `lax.sort` does not lower inside Mosaic,
  so the kernel computes the SAME order statistic by bitwise bisection:
  squared distances are non-negative, and non-negative IEEE-754 floats
  order identically to their int32 bit patterns, so a 31-step binary
  search on the bit pattern counting `<= mid` ranks is EXACT (bit-identical
  to sorting and indexing). `test_stein_pallas.py` pins this equality.
- Supports the flagship coupling (Hessian-preconditioned SVGD transport,
  svn_full_grad=False) with optional MAP-prior term + kernel whitening
  (cfg.prior_information). The full second-order SVN coupling keeps the
  XLA path (svn.py gates on cfg).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import residuals


def lower_median_bisect(sq: jax.Array, k: int | None = None) -> jax.Array:
    """Exact lower median of a flat non-negative f32 array via bit-pattern
    bisection (== jnp.sort(sq)[(n-1)//2], no sort). Pass `k` to select a
    different order statistic — the padded-ensemble path asks for the
    lower median of only the first true_p^2 valid entries by setting the
    invalid ones to the max-finite sentinel (they sort above every valid
    value) and k = (true_p^2 - 1) // 2.

    Accepts any array shape (the rank count is a full reduction — no
    flatten: Mosaic rejects the [P,P]->[P*P] shape cast at small P,
    "infer-vector-layout: unsupported shape cast" observed at P=16)."""
    import math

    n = math.prod(sq.shape)
    if k is None:
        k = (n - 1) // 2             # 0-indexed rank of the lower median
    bits = jax.lax.bitcast_convert_type(sq, jnp.int32)

    def step(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        count = jnp.sum((bits <= mid).astype(jnp.int32))
        take_lo = count >= k + 1
        return (jnp.where(take_lo, lo, mid + 1),
                jnp.where(take_lo, mid, hi))

    lo0 = jnp.zeros((), jnp.int32)
    hi0 = jnp.full((), 0x7F7FFFFF, jnp.int32)    # max finite f32
    lo, _ = jax.lax.fori_loop(0, 31, step, (lo0, hi0))
    # Mosaic's tpu.bitcast only accepts vectors — bitcast a [1] vector and
    # take the lane back out
    return jax.lax.bitcast_convert_type(lo[None], jnp.float32)[0]


def _rot_mats_unrolled(omega):
    """(exp(w^), J_l(w)) as 3x3 nested lists of [P] vectors, batched-matmul
    free: W^2 = w w^T - |w|^2 I closes the Rodrigues forms over ENTRIES, so
    the whole thing is elementwise VPU math Mosaic lowers happily (the
    geo.bso3_* versions build [P,3,3] tensors through batched matmuls,
    which tpu.matmul rejects for these layouts). Same guarded Taylor
    coefficients as geometry.py (shared helper)."""
    w = [omega[:, 0], omega[:, 1], omega[:, 2]]
    a2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    sinc, cosc, sinc3 = geo._taylor_coeffs_sq(a2)
    zero = jnp.zeros_like(a2)
    skw = [[zero, -w[2], w[1]], [w[2], zero, -w[0]], [-w[1], w[0], zero]]
    dr = [[None] * 3 for _ in range(3)]
    jl = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            w2 = w[i] * w[j] - (a2 if i == j else zero)
            eye = 1.0 if i == j else 0.0
            dr[i][j] = eye + sinc * skw[i][j] + cosc * w2
            jl[i][j] = eye + cosc * skw[i][j] + sinc3 * w2
    return dr, jl


def stein_body(hess, b, r, t, coords, *, max_dist: float, prior_inv=None,
               prior_scale=None, true_p: int | None = None):
    """The ensemble update as one jnp expression (shared kernel/oracle
    body). Mirrors svn._svn_iteration's post-moment half, with the
    sort-median replaced by the bit-exact bisection and the batched small
    matmuls/einsums replaced by Mosaic-friendly algebra:
    - grad_k row i = sum_j (x_i - x_j) K_ij = x_i * rowsum(K) - K @ x
      (identical math, matmul form);
    - exp(w^)/J_l unrolled over entries via W^2 = w w^T - |w|^2 I.

    `coords` = [t, log R] [P,6] is computed by the CALLER: so3_log needs
    atan2, which Mosaic does not lower (sin/cos/sqrt/exp/log all do —
    probed on v5e); everything else stays in-kernel.
    prior_inv/prior_scale implement cfg.prior_information (MAP prior on
    H/b + kernel whitening — svn.add_prior_information/prior_kernel_scale);
    None disables both.

    `true_p`: Mosaic needs P to be a sublane multiple (% 8 — "Lane
    broadcast" rejection observed at the geode operating point's P=10), so
    non-multiple ensembles are PADDED by the caller (identity hess, zero
    b/t, identity r) and `true_p` < P marks the valid prefix. Masking makes
    the padded ensemble's math EXACTLY the unpadded ensemble's: pad pairs'
    squared distances are set to +inf, so (a) the bandwidth bisection at
    rank (true_p^2-1)//2 returns the true lower median of the valid pairs,
    and (b) exp(-inf/bw) is an exact 0.0 kernel weight — pad rows/cols
    vanish from every coupling sum.
    h_mean and the exit statistics divide by true_p; pad rows' stein grad
    is zeroed (their pose update is identity) and the caller slices them
    off. Returns (r_new, t_new, stein_grad)."""
    pp = coords.shape[0]
    p = pp if true_p is None else true_p
    row_valid = None
    if true_p is not None and true_p < pp:
        row_valid = (jax.lax.broadcasted_iota(jnp.int32, (pp, 1), 0)
                     < true_p)                                   # [P,1]
    if prior_inv is not None:
        hess = hess + jnp.eye(6, dtype=hess.dtype)[None] * prior_inv[None, None, :]
        b = b + coords * prior_inv[None, :]
    newton = residuals.cholesky_solve6(hess, b)                  # [P,6]
    if row_valid is None:
        h_mean = jnp.mean(hess, axis=0)
    else:
        newton = jnp.where(row_valid, newton, 0.0)
        h_mean = jnp.sum(jnp.where(row_valid[:, :, None], hess, 0.0),
                         axis=0) / p
    x = coords if prior_scale is None else coords / prior_scale[None, :]
    # center the kernel coordinates: grad_k row i = sum_j K_ij (x_i - x_j)
    # is translation-invariant, but the matmul form below (x*ksum - K@x)
    # subtracts two large near-equal numbers once the ensemble converges
    # (|x| >> spread) — f32 cancellation there injects ~1e-3-relative noise
    # into the repulsion that the XLA path's direct sum over differences
    # does not have (measured: 3/3 proxy seeds with slightly worse ATE at
    # P=10 KF mode before this). Centering puts |x_c| at spread scale, so
    # the cancellation disappears; sq/diff are unchanged by construction.
    if row_valid is None:
        x = x - jnp.mean(x, axis=0, keepdims=True)
    else:
        x = x - jnp.sum(jnp.where(row_valid, x, 0.0), axis=0,
                        keepdims=True) / p
    diff = x[:, None, :] - x[None, :, :]                         # [P,P,6]
    sq = jnp.sum(diff * diff, axis=-1)
    if row_valid is not None:
        # +inf sentinel: the bisection's search range caps at max-finite so
        # inf entries are never counted (rank k lands inside the valid
        # prefix), and exp(-inf/bw) is an exact 0.0 for any finite bw
        pair_valid = jnp.logical_and(row_valid, row_valid.reshape(1, pp))
        sq = jnp.where(pair_valid, sq, jnp.asarray(jnp.inf, sq.dtype))
    med = lower_median_bisect(sq, k=(p * p - 1) // 2)
    bw = jnp.maximum(med / jnp.log(jnp.asarray(float(p + 1), x.dtype)),
                     jnp.asarray(1e-12, x.dtype))
    kernel = jnp.exp(-sq / bw)
    ksum = jnp.sum(kernel, axis=1)                               # [P]
    if row_valid is not None:
        ksum = jnp.maximum(ksum, 1e-30)      # pad rows: all-zero kernel row
    kx = jnp.matmul(kernel, x, precision=jax.lax.Precision.HIGHEST)
    grad_k = (2.0 / bw) * (x * ksum[:, None] - kx)
    if prior_scale is not None:
        grad_k = grad_k / prior_scale[None, :]
    repulsion = residuals.cholesky_solve6(h_mean, grad_k)
    drive = jnp.matmul(kernel, -newton,
                       precision=jax.lax.Precision.HIGHEST)
    stein = (drive + repulsion) / ksum[:, None]
    # trust-region clip (svn.clip_step)
    norm = jnp.sqrt(jnp.sum(stein * stein, axis=-1, keepdims=True))
    cap = jnp.asarray(max_dist, stein.dtype)
    stein = stein * jnp.minimum(1.0, cap / jnp.maximum(norm, 1e-30))
    if row_valid is not None:
        stein = jnp.where(row_valid, stein, 0.0)
    # right-multiplicative pose update (svn._pose_update), unrolled
    dr, jl = _rot_mats_unrolled(stein[:, 3:])
    rl = [[r[:, i, j] for j in range(3)] for i in range(3)]
    rn = [[sum(rl[i][k] * dr[k][j] for k in range(3)) for j in range(3)]
          for i in range(3)]
    dt = [stein[:, 0], stein[:, 1], stein[:, 2]]
    dt_l = [sum(jl[i][j] * dt[j] for j in range(3)) for i in range(3)]
    t_new = jnp.stack(
        [sum(rn[i][j] * dt_l[j] for j in range(3)) + t[:, i]
         for i in range(3)], axis=-1)
    r_new = jnp.stack([jnp.stack(row, axis=-1) for row in rn], axis=-2)
    return r_new, t_new, stein


def _kernel(hess_ref, b_ref, r_ref, t_ref, coords_ref, prior_ref,
            r_out, t_out, stats_out, *, max_dist: float, use_prior: bool,
            true_p: int | None = None):
    prior_inv = prior_scale = None
    if use_prior:
        prior_inv = prior_ref[0]
        prior_scale = prior_ref[1]
    r_new, t_new, stein = stein_body(
        hess_ref[...], b_ref[...], r_ref[...], t_ref[...], coords_ref[...],
        max_dist=max_dist, prior_inv=prior_inv, prior_scale=prior_scale,
        true_p=true_p)
    r_out[...] = r_new
    t_out[...] = t_new
    # stats kept 2-D end to end: Mosaic's layout inference rejects sqrt on
    # the 1-D [P] intermediate a plain norm produces ("invalid relayout").
    # Pad rows' stein is zeroed by stein_body, so sums over the full axis
    # divided by the TRUE count give the unpadded statistics exactly.
    p = stein.shape[0] if true_p is None else true_p
    n2 = jnp.sum(stein * stein, axis=-1, keepdims=True)       # [P,1]
    gn = jnp.sum(jnp.sqrt(n2)) / p
    mean_step = jnp.sum(stein, axis=0, keepdims=True) / p     # [1,6]
    md = jnp.sqrt(jnp.sum(mean_step * mean_step))
    stats_out[...] = jnp.concatenate(
        [gn.reshape(1, 1), md.reshape(1, 1)], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("max_dist", "use_prior", "true_p",
                                    "interpret"))
def stein_update(hess: jax.Array, b: jax.Array, r: jax.Array, t: jax.Array,
                 prior: jax.Array | None = None, *, max_dist: float,
                 use_prior: bool = False, true_p: int | None = None,
                 interpret: bool = False):
    """One fused ensemble update.

    hess [P,6,6], b [P,6], r [P,3,3], t [P,3]; prior [2,6] rows =
    (prior_inv, prior_scale) when use_prior. `true_p` < P marks a padded
    ensemble's valid prefix (see stein_body) — the trailing pad rows must
    be identity r / zero t / identity hess / zero b, and their outputs are
    identity (slice them off). Returns (r_new [P,3,3], t_new [P,3],
    grad_norm scalar, mean_delta scalar)."""
    p = r.shape[0]
    dtype = r.dtype
    if prior is None:
        prior = jnp.zeros((2, 6), dtype)
    coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)
    r_new, t_new, stats = pl.pallas_call(
        functools.partial(_kernel, max_dist=max_dist, use_prior=use_prior,
                          true_p=true_p),
        out_shape=(
            jax.ShapeDtypeStruct((p, 3, 3), dtype),
            jax.ShapeDtypeStruct((p, 3), dtype),
            jax.ShapeDtypeStruct((2, 1), dtype),
        ),
        interpret=interpret,
    )(hess, b, r, t, coords, prior)
    return r_new, t_new, stats[0, 0], stats[1, 0]
