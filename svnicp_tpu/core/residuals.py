"""Robust point-to-point residuals and block-structured Gauss-Newton assembly.

TPU-native replacement for the reference's per-particle J/H/b einsums
(ref: svn-icp/src/core/SVNICP.cpp:116-164, `Newton_grad_right`). The reference
materializes J as a [P,B,3,6] tensor and contracts it twice; here we exploit
J = R_c [I | -ŝ] (R_c orthonormal) so JᵀWJ collapses to weighted point moments:

    H = [[ Σw · I        , -skew(Σ w s) ],
         [ skew(Σ w s)   , tr(M2)·I - M2 ]],   M2 = Σ w s sᵀ
    b = [ R_cᵀ Σ (w e) ;  Σ s × (R_cᵀ w e) ]

which is O(B·9) VPU work and removes the [P,B,3,6] HBM traffic entirely —
the identity holds because R_cᵀR_c = I.

Outlier handling reproduces the reference exactly, including its quirk
(SURVEY.md §7.5): gated-out pairs are *zeroed*, not dropped, so they
contribute weight 1 and ŝ = 0 — i.e. +I to the translation block of H
(damping) and nothing to b (ref: SVGDICP.cpp:331-333 point_filter +
SVNICP.cpp:119-125).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from svnicp_tpu.core import geometry as geo

_JITTER = 1e-6


def robust_weight(err_norm: jax.Array, max_dist: float) -> jax.Array:
    """Geman-McClure-style M-estimator weight (ref: SVNICP.cpp:122)."""
    return jnp.square(max_dist / (max_dist + 3.0 * err_norm))


def gauss_newton_system(
    source: jax.Array,       # [B,3] source points in the local (scan) frame
    transformed: jax.Array,  # [B,3] R_total @ source + t_total
    target: jax.Array,       # [B,3] matched target points
    pair_valid: jax.Array,   # [B] bool: correspondence inside the distance gate
    point_valid: jax.Array,  # [B] bool: source point is real (not padding)
    r_total: jax.Array,      # [3,3] compound rotation R0 @ R
    max_dist: float,
) -> tuple[jax.Array, jax.Array]:
    """Assemble (H [6,6], b [6]) for one particle; vmap over the ensemble.

    Parameter ordering is [translation(3), rotation(3)] matching the particle
    coordinates (ref: SVNICP.cpp:146 J = [R | -R ŝ]).

    Gating semantics: REAL points outside the distance gate contribute the
    reference's w=1/s=0 identity damping; PADDED points (point_valid False)
    contribute nothing — the reference has no padding, so excluding it keeps
    H independent of the configured capacity.
    """
    gate = pair_valid[:, None].astype(source.dtype)
    s = source * gate
    e = (transformed - target) * gate
    err_norm = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = robust_weight(err_norm, max_dist)          # [B,1]; gated pairs get w=1
    w = w * point_valid[:, None].astype(source.dtype)
    we = w * e                                      # singly-weighted error (b)

    sw = jnp.sum(w)
    m1 = jnp.sum(w * s, axis=0)                     # Σ w s
    m2 = jnp.einsum("bi,bj->ij", w * s, s, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(3, dtype=source.dtype)

    h_tt = sw * eye
    h_tr = -geo.skew(m1)
    h_rr = jnp.trace(m2) * eye - m2
    h = jnp.block([[h_tt, h_tr], [-h_tr, h_rr]]) + _JITTER * jnp.eye(6, dtype=source.dtype)

    # b needs e weighted once more for the H-side but only once here:
    # reference computes b = Σ Jᵀ (w e) with e already robust-weighted.
    rte = jnp.einsum("ji,bj->bi", r_total, we, precision=jax.lax.Precision.HIGHEST)
    b_t = jnp.sum(rte, axis=0)
    b_r = jnp.sum(jnp.cross(s, rte), axis=0)
    b = jnp.concatenate([b_t, b_r])
    return h, b


def plane_normals(
    cand_pts: jax.Array,      # [B,K,3] candidate target points per source point
    cand_valid: jax.Array,    # [B,K] bool
) -> tuple[jax.Array, jax.Array]:
    """Per-source-point local surface normals from the stage-1 candidate sets.

    The K candidates of a source point ARE the local neighborhood of the
    target surface (ref two-stage pre-pairing, SVGDICP.cpp:176-215), so the
    smallest-eigenvector of their 3x3 scatter is the classic k-NN plane fit —
    no extra neighbor search is needed, and the fit is loop-invariant (done
    once per frame). No reference analogue: the reference is point-to-point
    only; this powers the point-to-plane residual option.

    Batched closed-form symmetric 3x3 eigen-solve (trigonometric / Smith's
    method) — `jnp.linalg.eigh` on [B,3,3] lowers to a serial loop on TPU,
    while this is pure VPU elementwise work.

    Returns (normals [B,3] unit vectors, valid [B] bool). Invalid when fewer
    than 3 candidates or the neighborhood is degenerate (collinear/isotropic
    to machine precision).
    """
    f32 = cand_pts.dtype
    m = cand_valid.astype(f32)                          # [B,K]
    n = jnp.sum(m, axis=-1)                             # [B]
    n_safe = jnp.maximum(n, 1.0)
    mean0 = jnp.sum(cand_pts * m[..., None], axis=1) / n_safe[:, None]

    # Soft local refit: with large K the candidate set spans several meters
    # and often MULTIPLE surfaces, which biases a plain scatter fit
    # (measured: K=100 normals gave 3x worse ATE than K=32 on the demo
    # scene). Downweight candidates far from the set's center with a
    # self-normalizing Gaussian (bandwidth = mean squared spread), then
    # recompute the weighted mean/covariance — a one-step robust refit that
    # concentrates the fit on the dominant local surface at any K.
    d0 = cand_pts - mean0[:, None, :]
    r2 = jnp.sum(d0 * d0, axis=-1)                      # [B,K]
    h = jnp.sum(r2 * m, axis=-1) / n_safe               # mean sq spread
    w = m * jnp.exp(-r2 / jnp.maximum(h, 1e-12)[:, None])
    sw = jnp.maximum(jnp.sum(w, axis=-1), 1e-6)
    mean = jnp.sum(cand_pts * w[..., None], axis=1) / sw[:, None]
    d = (cand_pts - mean[:, None, :]) * jnp.sqrt(w)[..., None]
    cov = jnp.einsum("bki,bkj->bij", d, d, precision=jax.lax.Precision.HIGHEST)
    cov = cov / sw[:, None, None]

    # Smith's trigonometric eigenvalues for symmetric 3x3
    q = jnp.trace(cov, axis1=-2, axis2=-1) / 3.0        # [B]
    eye = jnp.eye(3, dtype=f32)
    a_q = cov - q[:, None, None] * eye
    p2 = jnp.sum(a_q * a_q, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    p_safe = jnp.maximum(p, 1e-20)
    bmat = a_q / p_safe[:, None, None]
    detb = jnp.linalg.det(bmat)
    phi = jnp.arccos(jnp.clip(detb / 2.0, -1.0, 1.0)) / 3.0
    lam_hi = q + 2.0 * p * jnp.cos(phi)                                # largest
    lam_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)           # smallest
    lam_mid = 3.0 * q - lam_hi - lam_lo

    # eigenvector of lam_lo: columns of (C - lam_hi I)(C - lam_mid I) span it
    m = jnp.matmul(cov - lam_hi[:, None, None] * eye,
                   cov - lam_mid[:, None, None] * eye,
                   precision=jax.lax.Precision.HIGHEST)
    col_norm2 = jnp.sum(m * m, axis=1)                  # [B,3] per-column
    best = jnp.argmax(col_norm2, axis=-1)
    vec = jnp.take_along_axis(m, best[:, None, None], axis=2)[..., 0]
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    normals = vec / jnp.maximum(norm, 1e-20)

    # planar fit quality: enough points, anisotropic scatter, non-degenerate
    # eigenvector extraction
    # collinearity gate: a plane fit needs 2-D spread — a near-rank-1
    # scatter (neighbors along one scan-ring arc) has an arbitrary smallest
    # eigenvector, so such fits are rejected by requiring the middle
    # eigenvalue to carry >= 5% of the largest. Validity guard only:
    # measured bit-neutral on isotropically-sampled scans and it does NOT
    # fix the capped-range raycast drift (BASELINE.md negative result —
    # post-downsample neighborhoods there are 2-D enough to pass).
    valid = ((n >= 3.0) & (p > 1e-12) & (norm[..., 0] > 1e-12)
             & (lam_mid > 0.05 * lam_hi))
    return normals, valid


def gauss_newton_system_plane(
    source: jax.Array,       # [B,3] source points in the local (scan) frame
    transformed: jax.Array,  # [B,3] R_total @ source + t_total
    target: jax.Array,       # [B,3] matched target points
    normals: jax.Array,      # [B,3] unit surface normals at the target
    pair_valid: jax.Array,   # [B] bool: gate AND plane-fit AND source validity
    r_total: jax.Array,      # [3,3] compound rotation R0 @ R
    max_dist: float,
) -> tuple[jax.Array, jax.Array]:
    """Point-to-plane (H [6,6], b [6]) for one particle; vmap over particles.

    Residual r_b = n_bT (T s_b - q_b); with the right-perturbation Jacobian
    J = R_c [I | -s^] (same frame as the point-to-point system above) the
    per-point gradient direction is g_b = [R_cT n_b ; s_b x (R_cT n_b)] so

        H = sum w g gT + jitter I,   b = sum (w r) g

    — one [B,6] outer-product contraction, no [B,3,6] Jacobian materialized.

    Divergence from the reference gating quirk (deliberate, documented):
    the reference's +I damping for gated pairs is a point-to-POINT artifact
    (w=1, s=0 under zeroed inputs); here gated/invalid pairs simply drop out
    (w=0). The 1e-6 jitter keeps H SPD.
    """
    gate = pair_valid.astype(source.dtype)
    r = jnp.sum(normals * (transformed - target), axis=-1)   # [B] signed dist
    w = robust_weight(jnp.abs(r)[:, None], max_dist)[:, 0] * gate

    rtn = jnp.einsum("ji,bj->bi", r_total, normals,
                     precision=jax.lax.Precision.HIGHEST)    # R_cT n
    g = jnp.concatenate([rtn, jnp.cross(source, rtn)], axis=-1)   # [B,6]
    h = jnp.einsum("b,bi,bj->ij", w, g, g,
                   precision=jax.lax.Precision.HIGHEST)
    h = h + _JITTER * jnp.eye(6, dtype=source.dtype)
    b = jnp.einsum("b,bi->i", w * r, g, precision=jax.lax.Precision.HIGHEST)
    return h, b


def solve_newton(h: jax.Array, b: jax.Array) -> jax.Array:
    """Solve H x = b for the [6] Newton direction via Cholesky.

    H is SPD by construction (+jitter); Cholesky is both faster and more
    f32-robust on TPU than LU (ref uses torch::linalg::solve, SVNICP.cpp:162).
    """
    return cholesky_solve6(h, b)


def cholesky_solve6(h: jax.Array, b: jax.Array) -> jax.Array:
    """Batched SPD 6x6 solve, fully unrolled into elementwise ops.

    `jax.scipy.linalg.cho_factor`/`cho_solve` lower batched small Cholesky
    to sequential XLA loops on TPU — a serial bottleneck inside the SVN
    iteration (runs every epoch on [P,6,6]). Unrolling the 6x6 factorization
    and the two triangular substitutions into ~120 scalar expressions makes
    every step a [batch]-shaped VPU op that XLA fuses into a handful of
    kernels. Pivots carry a scale-relative floor (see below) so the solve
    stays FINITE even when f32 cancellation eats the reference's 1e-6
    jitter (SVNICP.cpp:153) on rank-deficient input; on well-conditioned
    input the floor never engages and the result is bit-identical to plain
    Cholesky. Supports any leading batch shape, with numpy broadcasting
    between h [...,6,6] and b [...,6].
    """
    a = [[h[..., i, j] for j in range(6)] for i in range(6)]
    l = [[None] * 6 for _ in range(6)]
    linv = [None] * 6
    for j in range(6):
        s = a[j][j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        # pivot floor: for a rank-deficient H (e.g. 0-2 valid pairs after the
        # particles walked outside the correspondence gate) the upstream 1e-6
        # jitter sits BELOW the f32 cancellation error of O(|H|) entries, so
        # the mathematically-tiny pivot can round negative -> sqrt NaN that
        # poisons the whole ensemble (and whether it fires depends on XLA's
        # fusion rounding, making the failure jit- and backend-sensitive;
        # observed on segmented-scan plane alignments). The scale-relative
        # floor keeps the factorization finite — the resulting huge step
        # along the deficient direction is bounded by clip_step's trust
        # region downstream. Well-conditioned pivots (>= the 1e-6 jitter)
        # exceed the floor and are bit-identical to the unguarded form.
        s = jnp.maximum(s, 1e-12 * (1.0 + jnp.abs(a[j][j])))
        l[j][j] = jnp.sqrt(s)
        linv[j] = 1.0 / l[j][j]
        for i in range(j + 1, 6):
            s = a[i][j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * linv[j]
    y = [None] * 6
    for i in range(6):
        s = b[..., i]
        for k in range(i):
            s = s - l[i][k] * y[k]
        y[i] = s * linv[i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - l[k][i] * x[k]
        x[i] = s * linv[i]
    return jnp.stack(x, axis=-1)


# Ensemble versions: vmap over the leading particle axis of (transformed,
# pair_valid, r_total); source/point_valid are shared. The solve is natively
# batched (elementwise over the leading axes), no vmap needed.
ensemble_gauss_newton = jax.vmap(gauss_newton_system, in_axes=(None, 0, 0, 0, None, 0, None))
ensemble_gauss_newton_plane = jax.vmap(
    gauss_newton_system_plane, in_axes=(None, 0, 0, None, 0, 0, None)
)
ensemble_solve = cholesky_solve6
