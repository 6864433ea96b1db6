"""Stein Variational Newton ICP: the registration engine.

TPU-native re-design of the reference's SVN-ICP core
(ref: svn-icp/src/core/SVNICP.cpp:41-279 + the SVGD base-class plumbing in
SVGDICP.cpp:66-140). Differences in *shape*, none in math:

- the per-particle loop is a vmapped batch over a leading particle axis
  inside one jitted function (the reference already batches over P with
  libtorch; here vmap + XLA fuse the whole iteration into one program);
- J/H/b use the block-moment identity (see core/residuals.py) instead of
  materializing [P,B,3,6] Jacobians;
- the iteration loop is a `lax.while_loop` with on-device early stopping
  (ref checks `stein_grad.norm(2,1).mean(0) < thr` on the host each epoch,
  SVNICP.cpp:95-101 — here no host sync happens at all);
- fixed shapes with validity masks everywhere.

Reference behavioral quirks reproduced deliberately (SURVEY.md §7.5):
- the correspondence gate compares *squared* distance against the un-squared
  `max_dist` (point_filter, SVGDICP.cpp:331-333 — PyTorch3D returns squared
  L2), so the effective gate radius is sqrt(max_dist);
- gated-out pairs contribute identity blocks to H (see residuals.py);
- particle weights stay uniform (Beta-Stein weighting is vestigial upstream).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import residuals
from svnicp_tpu.kernels import knn


def _pallas_ok() -> bool:
    """Single source of truth for Pallas eligibility lives in nn_pallas
    (kernels and callers must agree); kept as a local name for the hot-path
    call sites."""
    from svnicp_tpu.kernels import nn_pallas

    return nn_pallas.pallas_ok()


class AlignResult(NamedTuple):
    """Outputs of one alignment (ref getters: SVNICP.cpp:281-308)."""

    particles: jax.Array      # [P,6] local correction per particle: [t, log R]
    weights: jax.Array        # [P] uniform (kept for API parity)
    mean: jax.Array           # [6] weighted mean correction
    var: jax.Array            # [6] per-dim weighted variance
    cov: jax.Array            # [6,6] weighted covariance
    iterations: jax.Array     # scalar int32: iterations actually run
    grad_norm: jax.Array      # scalar: mean |stein_grad| at exit


class _LoopState(NamedTuple):
    r: jax.Array              # [P,3,3] local rotation (right-perturbation)
    t: jax.Array              # [P,3] local translation
    it: jax.Array             # scalar int32
    grad_norm: jax.Array      # scalar
    done: jax.Array           # scalar bool


def init_particles_uniform(key: jax.Array, count: int, lb, ub, dtype=jnp.float32) -> jax.Array:
    """Uniform particle prior in a box, [P,6]; P==1 collapses to zeros
    (ref: svn-icp/src/core/ICPUtils.cpp:45-58)."""
    if count == 1:
        return jnp.zeros((1, 6), dtype)
    lb = jnp.asarray(lb, dtype)
    ub = jnp.asarray(ub, dtype)
    u = jax.random.uniform(key, (count, 6), dtype)
    return lb + (ub - lb) * u


def init_particles_gaussian(key: jax.Array, count: int, std, dtype=jnp.float32) -> jax.Array:
    """Zero-mean Gaussian prior clamped at 3 sigma, [P,6]
    (ref: svn-icp/src/core/ICPUtils.cpp:60-75)."""
    if count == 1:
        return jnp.zeros((1, 6), dtype)
    std = jnp.asarray(std, dtype)
    z = jax.random.normal(key, (count, 6), dtype) * std
    return jnp.clip(z, -3.0 * std, 3.0 * std)


def median_bandwidth(x_full: jax.Array) -> jax.Array:
    """h = median(pairwise sq dists) / log(P+1)  (ref: SVNICP.cpp:254-266).

    Uses the torch-style *lower* median over all P^2 entries (incl. the zero
    diagonal) for bit-parity with the reference, guarded against collapse.
    Takes the FULL particle set so every shard computes the same value.
    """
    p = x_full.shape[0]
    diff = x_full[:, None, :] - x_full[None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    flat = jnp.sort(sq.reshape(-1))
    lower_median = flat[(p * p - 1) // 2]
    h = lower_median / jnp.log(jnp.asarray(float(p + 1), x_full.dtype))
    return jnp.maximum(h, jnp.asarray(1e-12, x_full.dtype))


def rbf_kernel_block(
    x_rows: jax.Array,        # [Pl,6] local particle coordinates
    x_full: jax.Array,        # [P,6] all particle coordinates
    bw: jax.Array,            # scalar bandwidth (from median_bandwidth(x_full))
) -> tuple[jax.Array, jax.Array]:
    """RBF kernel rows K[i,j] = exp(-|x_i-x_j|^2/h) for local rows i.

    Row-block form: the single-device case is x_rows == x_full; under
    particle sharding each shard computes only its rows against the gathered
    full set (the all-gather of [P,6] is the Stein coupling's entire
    communication, SURVEY.md §2.3).
    Returns (kernel [Pl,P], diff [Pl,P,6] with diff[i,j] = x_i - x_j).
    """
    diff = x_rows[:, None, :] - x_full[None, :, :]
    sq = jnp.sum(diff * diff, axis=-1)
    return jnp.exp(-sq / bw), diff


def rbf_kernel(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Convenience full-matrix form (tests / single device)."""
    bw = median_bandwidth(x)
    kernel, diff = rbf_kernel_block(x, x, bw)
    return kernel, bw, diff


def svgd_precond_grad(
    x_rows: jax.Array,        # [Pl,6] local particle coordinates
    x_full: jax.Array,        # [P,6] all particles
    neg_newton_full: jax.Array,  # [P,6] -H^-1 b for all particles
    h_mean: jax.Array,        # [6,6] ensemble-mean Hessian (preconditioner)
    kernel_scale: jax.Array | None = None,   # [6] per-dim kernel whitening
) -> jax.Array:
    """Hessian-preconditioned SVGD transport rows (ref: SVNICP.cpp:218-227).

    `kernel_scale` (set under cfg.prior_information) whitens the kernel
    coordinates by the prior std — matrix-kernel SVGD with M = P^-1. The
    reference's scalar median bandwidth is shared across all 6 dims, so
    dims whose natural scale is tiny (rotations, ~1e-2 rad vs ~1e-1 m
    translations) receive vanishing repulsion and collapse to a point once
    a prior drive term exists; whitening makes repulsion uniform in
    prior-relative units so the equilibrium spread tracks the prior in
    EVERY unobservable dim."""
    if kernel_scale is not None:
        x_rows = x_rows / kernel_scale[None, :]
        x_full = x_full / kernel_scale[None, :]
    bw = median_bandwidth(x_full)
    kernel, diff = rbf_kernel_block(x_rows, x_full, bw)
    grad_k = (2.0 / bw) * jnp.einsum("ijd,ij->id", diff, kernel)
    if kernel_scale is not None:
        grad_k = grad_k / kernel_scale[None, :]    # pull back d/dw -> d/dx
    repulsion = residuals.cholesky_solve6(h_mean, grad_k)     # H^-1 grad
    drive = jnp.matmul(kernel, neg_newton_full, precision=jax.lax.Precision.HIGHEST)
    return (drive + repulsion) / jnp.sum(kernel, axis=1, keepdims=True)


def svn_full_update(
    x_rows: jax.Array,        # [Pl,6]
    x_full: jax.Array,        # [P,6]
    hess_full: jax.Array,     # [P,6,6] per-particle GN Hessians (all)
    neg_b_full: jax.Array,    # [P,6] negative GN gradient (all)
    lr: float,
) -> jax.Array:
    """Full second-order Stein-Newton update rows (ref: SVNICP.cpp:229-252)."""
    p = x_full.shape[0]
    bw = median_bandwidth(x_full)
    kernel, diff = rbf_kernel_block(x_rows, x_full, bw)
    grad_k = (2.0 / bw) * diff * kernel[..., None]             # [Pl,P,6]
    grad2 = jnp.einsum("ijk,ijl->ikl", grad_k, grad_k)         # Σ_j ∇k∇kᵀ
    k2h = jnp.einsum("ij,jkl->ikl", kernel * kernel, hess_full)
    h_bar = (k2h + grad2) / p                                  # [Pl,6,6]
    drive = (
        jnp.matmul(kernel, neg_b_full, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(grad_k, axis=1)
    ) / p
    return lr * residuals.cholesky_solve6(h_bar, drive)


def prior_inverse_variance(cfg: SteinICPConfig, dtype) -> jax.Array:
    """[6] precision of the particle-box prior N(0, P), P = (ub-lb)^2/12.
    Single source of truth for the prior parameterization — used by
    add_prior_information, the fused Pallas gate, and the parity tests."""
    lb = jnp.asarray(cfg.init_lb, dtype)
    ub = jnp.asarray(cfg.init_ub, dtype)
    return 1.0 / jnp.maximum((ub - lb) ** 2 / 12.0, 1e-12)


def prior_kernel_scale(cfg: SteinICPConfig, dtype) -> jax.Array:
    """Per-dim kernel whitening scale under cfg.prior_information: the
    prior std of the particle box (see svgd_precond_grad)."""
    return jnp.sqrt(1.0 / prior_inverse_variance(cfg, dtype))


def add_prior_information(cfg: SteinICPConfig, hess: jax.Array, b: jax.Array,
                          coords: jax.Array) -> tuple[jax.Array, jax.Array]:
    """MAP prior term (cfg.prior_information): the per-frame particle box as
    a Gaussian prior N(0, P) in local [t, log R] coordinates around the
    guess, P = box variance (ub-lb)^2/12. H += P^-1 and b += P^-1 x, so the
    Newton direction -H^-1 b pulls particles toward the prior center and the
    equilibrium spread along unobservable directions converges to the prior
    variance instead of diffusing without bound (see config.py). No
    reference analogue — the reference's prior enters only through particle
    initialization."""
    inv = prior_inverse_variance(cfg, coords.dtype)            # [6]
    hess = hess + jnp.diag(inv)[None, :, :]
    b = b + coords * inv[None, :]
    return hess, b


def clip_step(stein_grad: jax.Array, max_dist: float) -> jax.Array:
    """Per-particle trust region at the correspondence-gate scale.

    On exactly-degenerate geometry (e.g. a bare plane: x, y, yaw null) the
    GN Hessian's null rows are pure jitter (residuals._JITTER), so the
    preconditioned Stein repulsion H^-1 grad_k is ~grad_k/1e-6 along those
    directions — unbounded steps that explode the ensemble in ALL dims once
    the rotation update mixes axes. A step larger than max_dist is
    physically meaningless anyway (every correspondence breaks beyond the
    gate, SVNICP.cpp:331-333), so steps are norm-clipped there. Deliberate
    divergence from the reference, which has no such guard (it was only
    ever run on real scans, where sampling texture keeps H full-rank);
    below the cap the multiplier is exactly 1.0f, so non-degenerate
    behavior is bit-identical (transcript parity tests unaffected).
    """
    norm = jnp.linalg.norm(stein_grad, axis=-1, keepdims=True)
    cap = jnp.asarray(max_dist, stein_grad.dtype)
    tiny = jnp.asarray(1e-30, stein_grad.dtype)
    return stein_grad * jnp.minimum(1.0, cap / jnp.maximum(norm, tiny))


def _pose_update(r, t, stein_grad):
    """Right-multiplicative SE(3) update (ref: SVNICP.cpp:268-279):
    R <- R exp(w^), t <- R_new (J_l dt) + t."""
    dt, omega = stein_grad[:, :3], stein_grad[:, 3:]
    dr = geo.bso3_exp(omega)
    jl = geo.bso3_left_jacobian(omega)
    r_new = jnp.matmul(r, dr, precision=jax.lax.Precision.HIGHEST)
    dt_l = jnp.einsum("pij,pj->pi", jl, dt)
    t_new = jnp.einsum("pij,pj->pi", r_new, dt_l) + t
    return r_new, t_new


def ensemble_result(r: jax.Array, t: jax.Array, iterations: jax.Array,
                    grad_norm: jax.Array) -> AlignResult:
    """AlignResult statistics from final particle poses: uniform weights,
    weighted mean/var/cov (ref: SVNICP.cpp:281-308). The single place these
    are defined — the ESKF update consumes var/cov, so every method (svn,
    svgd history, svd) must produce them identically."""
    particles = _particle_coords(r, t)
    p = particles.shape[0]
    weights = jnp.full((p,), 1.0 / p, particles.dtype)
    mean = jnp.sum(particles * weights[:, None], axis=0)
    centered = particles - mean[None, :]
    var = jnp.sum(weights[:, None] * centered * centered, axis=0)
    cov = jnp.einsum("p,pi,pj->ij", weights, centered, centered)
    return AlignResult(particles, weights, mean, var, cov, iterations, grad_norm)


def _particle_coords(r, t):
    """[P,6] = [t, log R] — the coordinates the Stein kernel acts on
    (ref: SVNICP.cpp:74-77)."""
    return jnp.concatenate([t, geo.bso3_log(r)], axis=-1)


def correspondence_features(source: jax.Array, cand_pts: jax.Array,
                            cand_valid: jax.Array):
    """Loop-invariant features for MXU-formulated per-iteration 1-NN.

    The distance ranking score for particle pose (R,t) is
        score[p,b,k] = |c_bk|^2 - 2 <R s_b + t, c_bk>
                     = bias[b,k]  - 2 <[vec(R), t], feat[b,k]>
    with feat[b,k] = [vec(c_bk ⊗ s_b) (9), c_bk (3)] — i.e. the whole
    [P,B,K] distance tensor is ONE [P,12] x [12, B*K] matmul per iteration
    instead of B tiny batched [P,3]x[3,K] products. feat/bias depend only on
    the fixed candidate pre-pairing, so they are computed once per frame.
    """
    bsz, k = cand_pts.shape[:2]
    outer = jnp.einsum("bki,bj->bkij", cand_pts, source).reshape(bsz, k, 9)
    feat = jnp.concatenate([outer, cand_pts], axis=-1)         # [B,K,12]
    bias = jnp.sum(cand_pts * cand_pts, axis=-1)               # [B,K]
    bias = jnp.where(cand_valid, bias, jnp.inf)
    return feat.reshape(bsz * k, 12), bias


def _svn_iteration(cfg: SteinICPConfig, source, src_valid, cand_pts, cand_valid,
                   feat, bias, normals, pallas_prep, r0, t0, state):
    """One SVN epoch: correspondences -> J/H/b -> Stein coupling -> update.

    `normals` is None for point-to-point, or a (unit_normals [B,3],
    plane_valid [B]) pair for the point-to-plane residual option.
    `pallas_prep` carries the loop-invariant prepared kernel operands
    (built once per frame by _prepare_pallas; None = XLA path).
    """
    p = state.r.shape[0]
    bsz, k = cand_pts.shape[:2]
    r_total = jnp.matmul(r0[None], state.r, precision=jax.lax.Precision.HIGHEST)
    t_total = t0[None] + jnp.einsum("ij,pj->pi", r0, state.t)

    # 1-NN among candidates via the single-matmul score (see above)
    params = jnp.concatenate([r_total.reshape(p, 9), t_total], axis=-1)  # [P,12]
    if pallas_prep is not None:
        from svnicp_tpu.kernels import nn_pallas

        # fully-fused kernel: correspondence + robust weights + GN moments
        # in one pass — no [P,B,*] intermediate touches HBM
        hess, b = nn_pallas.fused_moments_dispatch(
            params, pallas_prep, normals is not None, cfg.max_dist)
    else:
        transformed = (
            jnp.einsum("pij,bj->pbi", r_total, source,
                       precision=jax.lax.Precision.HIGHEST)
            + t_total[:, None, :]
        )
        cross = jnp.matmul(params, feat.T, precision=jax.lax.Precision.HIGHEST)
        score = bias.reshape(1, bsz * k) - 2.0 * cross
        score = score.reshape(p, bsz, k)
        nn_idx = jnp.argmin(score, axis=-1).astype(jnp.int32)  # [P,B]
        best_score = jnp.take_along_axis(score, nn_idx[..., None], axis=-1)[..., 0]
        b_idx = jnp.arange(bsz)[None, :]
        matched = cand_pts[b_idx, nn_idx]                      # [P,B,3]
        nn_d2 = jnp.maximum(
            best_score + jnp.sum(transformed * transformed, axis=-1), 0.0
        )
        # reference quirk: gate compares squared distance against max_dist
        pair_valid = (nn_d2 < cfg.max_dist) & jnp.isfinite(best_score)
        if normals is not None:
            n_vec, n_valid = normals
            hess, b = residuals.ensemble_gauss_newton_plane(
                source, transformed, matched, n_vec,
                pair_valid & (n_valid & src_valid)[None, :], r_total,
                cfg.max_dist,
            )
        else:
            hess, b = residuals.ensemble_gauss_newton(
                source, transformed, matched, pair_valid, src_valid, r_total,
                cfg.max_dist,
            )
    if (pallas_prep is not None and cfg.stein_kernel and p > 1
            and not cfg.svn_full_grad and state.r.dtype == jnp.float32):
        # fused ensemble update: solve + Stein coupling + pose update in ONE
        # Pallas program (kernels/stein_pallas.py) — the same math as the
        # XLA path below, whose ~hundred small while-body ops cost more in
        # op overhead than the fused correspondence kernel itself.
        # Mosaic rejects the [P,P] coupling reductions at non-sublane-
        # multiple P ("Not implemented: Lane broadcast", observed at the
        # geode operating point's P=10), so such ensembles are PADDED to
        # the next multiple of 8 with identity particles the kernel masks
        # out exactly (true_p: the bandwidth median, coupling sums and exit
        # stats all see only the valid prefix — stein_pallas.stein_body);
        # the reference's own operating points (geode P=10, subt P=30) take
        # this path
        from svnicp_tpu.kernels import stein_pallas

        prior = None
        if cfg.prior_information:
            prior = jnp.stack([
                prior_inverse_variance(cfg, jnp.float32),
                prior_kernel_scale(cfg, jnp.float32),
            ])
        pad = (-p) % 8
        if pad:
            dt = state.r.dtype
            hess_k = jnp.concatenate(
                [hess, jnp.broadcast_to(jnp.eye(6, dtype=dt)[None], (pad, 6, 6))])
            b_k = jnp.concatenate([b, jnp.zeros((pad, 6), dt)])
            r_k = jnp.concatenate(
                [state.r, jnp.broadcast_to(jnp.eye(3, dtype=dt)[None], (pad, 3, 3))])
            t_k = jnp.concatenate([state.t, jnp.zeros((pad, 3), dt)])
        else:
            hess_k, b_k, r_k, t_k = hess, b, state.r, state.t
        r_new, t_new, grad_norm, mean_delta = stein_pallas.stein_update(
            hess_k, b_k, r_k, t_k, prior, max_dist=cfg.max_dist,
            use_prior=cfg.prior_information, true_p=p if pad else None)
        if pad:
            r_new, t_new = r_new[:p], t_new[:p]
        stop_stat = (mean_delta if cfg.convergence_metric == "mean_delta"
                     else grad_norm)
        return r_new, t_new, grad_norm, stop_stat

    coords = _particle_coords(state.r, state.t)
    kernel_scale = None
    if cfg.prior_information:
        hess, b = add_prior_information(cfg, hess, b, coords)
        kernel_scale = prior_kernel_scale(cfg, coords.dtype)
    newton = residuals.ensemble_solve(hess, b)                 # [P,6]
    if p > 1:
        if cfg.svn_full_grad:
            stein_grad = svn_full_update(coords, coords, hess, -b, cfg.lr)
        else:
            h_mean = jnp.mean(hess, axis=0)
            stein_grad = svgd_precond_grad(coords, coords, -newton, h_mean,
                                           kernel_scale)
    else:
        stein_grad = -newton
    stein_grad = clip_step(stein_grad, cfg.max_dist)

    r_new, t_new = _pose_update(state.r, state.t, stein_grad)
    grad_norm = jnp.mean(jnp.linalg.norm(stein_grad, axis=1))
    if cfg.convergence_metric == "mean_delta":
        # drift of the ensemble mean: repulsion cancels across particles at
        # equilibrium, so this converges even when the posterior stays wide
        stop_stat = jnp.linalg.norm(jnp.mean(stein_grad, axis=0))
    else:
        stop_stat = grad_norm
    return r_new, t_new, grad_norm, stop_stat


def _prepare_align(cfg, source, src_valid, cand_pts, cand_valid, r0, t0):
    """Per-frame, loop-invariant alignment setup shared by align and
    align_with_history: plane normals (from the FULL candidate set),
    optional match-set reduction, K-padding for the Pallas path,
    correspondence features, and the prepared kernel operands."""
    use_pallas = cfg.use_pallas and _pallas_ok()
    plane = cfg.residual == "point_to_plane"
    normals = None
    if plane:
        normals = residuals.plane_normals(cand_pts, cand_valid)
    if 0 < cfg.match_count < cand_pts.shape[1]:
        # per-iteration 1-NN only searches the match_count nearest-at-guess
        # candidates — the in-loop kernel cost scales with K, while the
        # plane fit above keeps the full set. Particles move well under
        # max_dist, so the per-particle NN stays inside the reduced set.
        at_guess = geo.transform_points(r0, t0, source)
        d2 = jnp.sum((cand_pts - at_guess[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_valid, d2, jnp.inf)
        _, idx = jax.lax.top_k(-d2, cfg.match_count)             # [B,m]
        cand_pts = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
        cand_valid = jnp.take_along_axis(cand_valid, idx, axis=1)
    if use_pallas:
        from svnicp_tpu.kernels import nn_pallas

        # both residuals run K-on-sublane kernels at TRUE K (multiple of 8)
        cand_pts, cand_valid = nn_pallas.pad_candidates(
            cand_pts, cand_valid, multiple=8)
    feat, bias = correspondence_features(source, cand_pts, cand_valid)
    prep = None
    # kb kernels need a 128-multiple point tile (free minor-dim split);
    # shapes that can't provide one fall back to the XLA path
    if use_pallas and source.shape[0] % 128 == 0:
        from svnicp_tpu.kernels import nn_pallas

        if normals is not None:
            n_vec, n_valid = normals
            prep = nn_pallas.prepare_moments_plane_kb(
                feat, bias, cand_pts, source, n_vec, n_valid & src_valid)
        else:
            prep = nn_pallas.prepare_moments_kb(feat, bias, cand_pts, source,
                                                src_valid)
    return cand_pts, cand_valid, normals, feat, bias, prep


@functools.partial(jax.jit, static_argnames=("cfg",))
def align(
    cfg: SteinICPConfig,
    source: jax.Array,        # [B,3] downsampled source points (scan frame)
    src_valid: jax.Array,     # [B] bool
    cand_pts: jax.Array,      # [B,K,3] stage-1 candidate target points
    cand_valid: jax.Array,    # [B,K] bool
    r0: jax.Array,            # [3,3] initial-guess rotation
    t0: jax.Array,            # [3] initial-guess translation
    init_particles: jax.Array,  # [P,6] prior particles [t, w]
) -> AlignResult:
    """Run the SVN-ICP ensemble to convergence (ref: SVNICP.cpp:41-114).

    Returns the local correction distribution relative to (r0, t0); compose
    `guess * exp(mean)` for the frame pose (ref: OdometryPipeline.cpp:615).
    """
    r_init = geo.bso3_exp(init_particles[:, 3:])
    t_init = init_particles[:, :3]

    cand_pts, cand_valid, normals, feat, bias, prep = _prepare_align(
        cfg, source, src_valid, cand_pts, cand_valid, r0, t0)
    iteration = functools.partial(
        _svn_iteration, cfg, source, src_valid, cand_pts, cand_valid, feat, bias,
        normals, prep, r0, t0
    )

    # NOTE(perf, measured on v5e): checking convergence every iteration in
    # the while_loop cond is the right structure. Batching iterations into
    # fixed-trip inner blocks (outer while over lax.fori blocks, per-
    # iteration state freeze) was tried to help XLA pipeline across
    # iterations and LOST: 20.2 fps (per-iteration check) vs 14.6 (block=10)
    # vs 17.3 (block=25) vs 12.2 (early stop off, 100 fixed iterations) at
    # the bench.py operating point — frames converge in well under 100
    # iterations, so frozen block-tail iterations dominate any loop-overhead
    # saving.
    def cond(state: _LoopState):
        return (~state.done) & (state.it < cfg.iterations)

    def body(state: _LoopState):
        r_new, t_new, grad_norm, stop_stat = iteration(state)
        done = (
            jnp.asarray(cfg.early_stop)
            & (stop_stat < cfg.convergence_threshold)
        )
        return _LoopState(r_new, t_new, state.it + 1, grad_norm, done)

    init = _LoopState(
        r_init,
        t_init,
        jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, source.dtype),
        # degenerate correspondence set (e.g. an empty/out-of-range scan):
        # with no pairs H is pure jitter and the SVGD repulsion H^-1 grad_k
        # explodes, so skip the loop entirely. grad_norm stays +inf — the
        # pipeline reads that as alignment failure and falls back to the
        # prediction (ref skips the frame, OdometryPipeline.cpp:599-601).
        _degenerate(src_valid, cand_valid),
    )
    final = jax.lax.while_loop(cond, body, init)

    return ensemble_result(final.r, final.t, final.it, final.grad_norm)


MIN_CONSTRAINT_POINTS = 6   # a 6-DoF system needs >= 6 constrained points


def valid_pair_count(src_valid: jax.Array, cand_valid: jax.Array) -> jax.Array:
    """Number of source points with at least one candidate (the degeneracy
    statistic; the sharded loops psum this over point shards)."""
    return jnp.sum(jnp.any(cand_valid, axis=1) & src_valid)


def _degenerate(src_valid: jax.Array, cand_valid: jax.Array) -> jax.Array:
    """True when too few source points have any candidate at all."""
    return valid_pair_count(src_valid, cand_valid) < MIN_CONSTRAINT_POINTS


@functools.partial(jax.jit, static_argnames=("cfg",))
def align_with_history(
    cfg: SteinICPConfig,
    source, src_valid, cand_pts, cand_valid, r0, t0, init_particles,
) -> tuple[AlignResult, jax.Array]:
    """`align` variant that also records the per-iteration particle stack
    [iters,P,6] (ref: particle_stack_ logging, SVNICP.cpp:103-107). Runs all
    `cfg.iterations` epochs with frozen updates after convergence."""
    r_init = geo.bso3_exp(init_particles[:, 3:])
    t_init = init_particles[:, :3]

    cand_pts, cand_valid, normals, feat, bias, prep = _prepare_align(
        cfg, source, src_valid, cand_pts, cand_valid, r0, t0)
    iteration = functools.partial(
        _svn_iteration, cfg, source, src_valid, cand_pts, cand_valid, feat, bias,
        normals, prep, r0, t0
    )

    def body(state: _LoopState, _):
        r_new, t_new, grad_norm, stop_stat = iteration(state)
        newly_done = jnp.asarray(cfg.early_stop) & (stop_stat < cfg.convergence_threshold)
        keep = ~state.done
        r_out = jnp.where(keep[None, None, None], r_new, state.r)
        t_out = jnp.where(keep[None, None], t_new, state.t)
        nxt = _LoopState(
            r_out,
            t_out,
            state.it + keep.astype(jnp.int32),
            jnp.where(keep, grad_norm, state.grad_norm),
            state.done | newly_done,
        )
        return nxt, _particle_coords(r_out, t_out)

    init = _LoopState(
        r_init, t_init, jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, source.dtype),
        _degenerate(src_valid, cand_valid),
    )
    final, history = jax.lax.scan(body, init, None, length=cfg.iterations)

    result = ensemble_result(final.r, final.t, final.it, final.grad_norm)
    return result, history


def register(
    cfg: SteinICPConfig,
    source: jax.Array,        # [B,3]
    src_valid: jax.Array,     # [B]
    target: jax.Array,        # [T,3]
    tgt_valid: jax.Array,     # [T]
    r0: jax.Array,
    t0: jax.Array,
    init_particles: jax.Array,
) -> AlignResult:
    """Full registration: stage-1 KNN candidate pre-pairing + SVN alignment.

    Mirrors add_cloud + knn_source_cloud + stein_align
    (ref: SVGDICP.cpp:46-62, 176-215; SVNICP.cpp:41-114): candidates are
    found once at the initial guess and reused across all iterations.
    """
    source_at_guess = geo.transform_points(r0, t0, source)
    cand_pts, cand_valid = knn.find_candidate_points(
        cfg, source_at_guess, target, src_valid, tgt_valid)
    return align(cfg, source, src_valid, cand_pts, cand_valid, r0, t0, init_particles)


def register_with_history(
    cfg: SteinICPConfig,
    source, src_valid, target, tgt_valid, r0, t0, init_particles,
) -> tuple[AlignResult, jax.Array]:
    """`register` variant returning the per-iteration particle stack
    [iters,P,6] alongside the result (ref: particle_stack_ logging fed to
    /svnicp/all_particles, SVNICP.cpp:103-107 + OdometryPipeline.cpp:966-985)."""
    source_at_guess = geo.transform_points(r0, t0, source)
    cand_pts, cand_valid = knn.find_candidate_points(
        cfg, source_at_guess, target, src_valid, tgt_valid)
    return align_with_history(cfg, source, src_valid, cand_pts, cand_valid,
                              r0, t0, init_particles)
