"""Multi-chip sharding of the SVN-ICP hot loop over a device mesh.

The reference is single-process/single-GPU; its only parallel axis is the
leading particle dimension of every tensor (SURVEY.md §2.3). This module is
the distributed design the TPU build adds on top:

- mesh axes ``("particle", "point")`` — the ensemble is sharded across chips
  and the source-point batch is sharded within each particle group;
- per-iteration J/H/b partial sums are reduced with ``psum`` over the point
  axis (the Schur-style Newton reduction);
- the Stein coupling exchanges only the tiny per-particle statistics —
  ``all_gather`` of [P,6] coordinates, [P,6] Newton directions and (for the
  full SVN kernel) [P,6,6] Hessians — over the particle axis; the P x P
  kernel matrix itself is computed block-locally (rows for local particles);
- the early-stop criterion is a ``pmean`` over the particle axis so every
  shard exits the while_loop on the same iteration.

Collectives ride ICI when the mesh maps onto one slice; everything is
ordinary ``jax.shard_map`` + named-axis collectives, so the same code runs on
the CPU-simulated 8-device mesh used in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import residuals
from svnicp_tpu.core import svn
from svnicp_tpu.kernels import knn

PARTICLE_AXIS = "particle"
POINT_AXIS = "point"


def make_mesh(particle_shards: int, point_shards: int, devices=None) -> Mesh:
    """Build a ("particle", "point") mesh over the given (or all) devices."""
    devices = jax.devices() if devices is None else devices
    n = particle_shards * point_shards
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    arr = np.asarray(devices[:n]).reshape(particle_shards, point_shards)
    return Mesh(arr, (PARTICLE_AXIS, POINT_AXIS))


def auto_axes(n_devices: int, particle_count: int) -> tuple[int, int]:
    """Factor n_devices into (particle, point) shards: as many particle
    shards as divide the ensemble, remainder into the point axis."""
    particle = 1
    while (
        particle * 2 <= n_devices
        and n_devices % (particle * 2) == 0
        and particle_count % (particle * 2) == 0
    ):
        particle *= 2
    return particle, n_devices // particle


def _degenerate_global(src_valid_l, cand_valid_l):
    """svn._degenerate over the point shards: the pair count is psum'd so
    every shard exits the alignment loop on the same iteration."""
    n = jax.lax.psum(svn.valid_pair_count(src_valid_l, cand_valid_l),
                     POINT_AXIS)
    return n < svn.MIN_CONSTRAINT_POINTS


def _sharded_iteration(cfg: SteinICPConfig, source, src_valid, cand_pts, cand_valid,
                       feat, bias, normals, prep, r0, t0, r, t):
    """One SVN epoch on a (particle, point) shard.

    source/cand_* are the local point shard [Bl,...]; r/t the local particle
    shard [Pl,...]; normals the local (unit_normals, plane_valid) pair or
    None (point-to-point); prep the per-shard prepared operands of the
    fused K-on-sublane Pallas kernels (None = XLA path — tests on the
    CPU-simulated mesh, or shard shapes the kernels can't tile). Returns
    updated local particles + the global early-stop statistic (grad norm or
    ensemble-mean drift per cfg.convergence_metric).
    """
    p_local = r.shape[0]
    bsz, k = cand_pts.shape[:2]
    r_total = jnp.matmul(r0[None], r, precision=jax.lax.Precision.HIGHEST)
    t_total = t0[None] + jnp.einsum("ij,pj->pi", r0, t)

    params = jnp.concatenate([r_total.reshape(p_local, 9), t_total], axis=-1)
    if prep is not None:
        # per-shard fused kernel: local H/b partials straight from VMEM
        from svnicp_tpu.kernels import nn_pallas

        hess, b = nn_pallas.fused_moments_dispatch(
            params, prep, normals is not None, cfg.max_dist)
    else:
        transformed = (
            jnp.einsum("pij,bj->pbi", r_total, source,
                       precision=jax.lax.Precision.HIGHEST)
            + t_total[:, None, :]
        )
        # MXU-formulated 1-NN (see svn.correspondence_features)
        cross = jnp.matmul(params, feat.T, precision=jax.lax.Precision.HIGHEST)
        score = (bias.reshape(1, bsz * k) - 2.0 * cross).reshape(p_local, bsz, k)
        nn_idx = jnp.argmin(score, axis=-1).astype(jnp.int32)
        best_score = jnp.take_along_axis(score, nn_idx[..., None], axis=-1)[..., 0]
        nn_d2 = jnp.maximum(
            best_score + jnp.sum(transformed * transformed, axis=-1), 0.0)
        b_idx = jnp.arange(bsz)[None, :]
        matched = cand_pts[b_idx, nn_idx]
        pair_valid = (nn_d2 < cfg.max_dist) & src_valid[None, :] & jnp.isfinite(best_score)

        # local-point partial H/b, then Schur-style psum over the point axis
        if normals is not None:
            n_vec, n_valid = normals
            hess, b = residuals.ensemble_gauss_newton_plane(
                source, transformed, matched, n_vec,
                pair_valid & n_valid[None, :], r_total, cfg.max_dist
            )
        else:
            hess, b = residuals.ensemble_gauss_newton(
                source, transformed, matched, pair_valid, src_valid, r_total,
                cfg.max_dist
            )
    # the +jitter and gate-damping identity blocks are added per point shard;
    # correct for the duplicated jitter after the reduction
    n_point_shards = jax.lax.psum(1, POINT_AXIS)
    hess = jax.lax.psum(hess, POINT_AXIS) - (n_point_shards - 1) * 1e-6 * jnp.eye(
        6, dtype=hess.dtype
    )
    b = jax.lax.psum(b, POINT_AXIS)
    coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)     # [Pl,6]
    kernel_scale = None
    if cfg.prior_information:
        # per-particle MAP prior, added once AFTER the point-shard psum
        hess, b = svn.add_prior_information(cfg, hess, b, coords)
        kernel_scale = svn.prior_kernel_scale(cfg, coords.dtype)
    newton = residuals.ensemble_solve(hess, b)
    coords_full = jax.lax.all_gather(coords, PARTICLE_AXIS, tiled=True)
    if cfg.svn_full_grad:
        hess_full = jax.lax.all_gather(hess, PARTICLE_AXIS, tiled=True)
        negb_full = jax.lax.all_gather(-b, PARTICLE_AXIS, tiled=True)
        stein_grad = svn.svn_full_update(coords, coords_full, hess_full, negb_full, cfg.lr)
    else:
        h_mean = jax.lax.pmean(jnp.mean(hess, axis=0), PARTICLE_AXIS)
        neg_newton_full = jax.lax.all_gather(-newton, PARTICLE_AXIS, tiled=True)
        stein_grad = svn.svgd_precond_grad(coords, coords_full, neg_newton_full,
                                           h_mean, kernel_scale)
    stein_grad = svn.clip_step(stein_grad, cfg.max_dist)

    dt_, omega = stein_grad[:, :3], stein_grad[:, 3:]
    dr = geo.bso3_exp(omega)
    jl = geo.bso3_left_jacobian(omega)
    r_new = jnp.matmul(r, dr, precision=jax.lax.Precision.HIGHEST)
    t_new = jnp.einsum("pij,pj->pi", r_new, jnp.einsum("pij,pj->pi", jl, dt_)) + t

    grad_norm = jax.lax.pmean(
        jnp.mean(jnp.linalg.norm(stein_grad, axis=1)), PARTICLE_AXIS
    )
    if cfg.convergence_metric == "mean_delta":
        # drift of the FULL ensemble mean: pmean of the local mean update
        mean_step = jax.lax.pmean(jnp.mean(stein_grad, axis=0), PARTICLE_AXIS)
        stop_stat = jnp.linalg.norm(mean_step)
    else:
        stop_stat = grad_norm
    del p_local
    return r_new, t_new, grad_norm, stop_stat


def run_align_loop(cfg: SteinICPConfig, iter_fn, r, t, degenerate,
                   history: bool):
    """The shard-local alignment loop, shared by every sharded align body.

    history=False: the plain early-stopping while_loop.
    history=True: a lax.scan over all cfg.iterations with post-convergence
    updates frozen (mirror of svn.align_with_history), each iteration
    emitting the FULL particle coordinates via a particle-axis all_gather —
    the [H,P,6] stack every shard returns replicated is exactly the
    single-device history contract (ref: /svnicp/all_particles,
    OdometryPipeline.cpp:966-985). Returns (final_state, hist|None).
    """
    init_state = (r, t, jnp.zeros((), jnp.int32),
                  jnp.asarray(jnp.inf, t.dtype), degenerate)
    if not history:
        def cond(state):
            return (~state[4]) & (state[2] < cfg.iterations)

        def step(state):
            r_, t_, it, gn, done = state
            r_n, t_n, grad_norm, stop_stat = iter_fn(r_, t_)
            done = (jnp.asarray(cfg.early_stop)
                    & (stop_stat < cfg.convergence_threshold))
            return (r_n, t_n, it + 1, grad_norm, done)

        return jax.lax.while_loop(cond, step, init_state), None

    def step(state, _):
        r_, t_, it, gn, done = state
        r_n, t_n, grad_norm, stop_stat = iter_fn(r_, t_)
        newly = (jnp.asarray(cfg.early_stop)
                 & (stop_stat < cfg.convergence_threshold))
        keep = ~done
        r_out = jnp.where(keep[None, None, None], r_n, r_)
        t_out = jnp.where(keep[None, None], t_n, t_)
        nxt = (r_out, t_out, it + keep.astype(jnp.int32),
               jnp.where(keep, grad_norm, gn), done | newly)
        coords_l = jnp.concatenate([t_out, geo.bso3_log(r_out)], axis=-1)
        return nxt, jax.lax.all_gather(coords_l, PARTICLE_AXIS, tiled=True)

    final, hist = jax.lax.scan(step, init_state, None, length=cfg.iterations)
    return final, hist


def sharded_align(
    mesh: Mesh,
    cfg: SteinICPConfig,
    source: jax.Array,         # [B,3] (sharded over the point axis)
    src_valid: jax.Array,      # [B]
    cand_pts: jax.Array,       # [B,K,3]
    cand_valid: jax.Array,     # [B,K]
    r0: jax.Array, t0: jax.Array,
    init_particles: jax.Array, # [P,6] (sharded over the particle axis)
    history: bool = False,
) -> svn.AlignResult:
    """Distributed `svn.align`: same math, mesh-parallel execution.

    Outputs are fully replicated (every chip ends with the complete particle
    set statistics), matching the single-device AlignResult contract.
    With history=True returns (result, [iters,P,6] particle stack) — the
    sharded form of svn.align_with_history.
    """

    def body(source_l, src_valid_l, cand_l, cand_valid_l, r0_l, t0_l, init_l):
        r = geo.bso3_exp(init_l[:, 3:])
        t = init_l[:, :3]
        normals = None
        if cfg.residual == "point_to_plane":
            # the plane fit uses only the local candidate shard — no comms
            normals = residuals.plane_normals(cand_l, cand_valid_l)
        prep = None
        if cfg.use_pallas and svn._pallas_ok() and source_l.shape[0] % 128 == 0:
            from svnicp_tpu.kernels import nn_pallas

            cand_l, cand_valid_l = nn_pallas.pad_candidates(
                cand_l, cand_valid_l, multiple=8)
            feat, bias = svn.correspondence_features(
                source_l, cand_l, cand_valid_l)
            if normals is not None:
                n_vec, n_valid = normals
                prep = nn_pallas.prepare_moments_plane_kb(
                    feat, bias, cand_l, source_l, n_vec,
                    n_valid & src_valid_l)
            else:
                prep = nn_pallas.prepare_moments_kb(
                    feat, bias, cand_l, source_l, src_valid_l)
        else:
            feat, bias = svn.correspondence_features(
                source_l, cand_l, cand_valid_l)

        def iter_fn(r_, t_):
            return _sharded_iteration(
                cfg, source_l, src_valid_l, cand_l, cand_valid_l, feat, bias,
                normals, prep, r0_l, t0_l, r_, t_
            )

        (r_f, t_f, it, gn, _), hist = run_align_loop(
            cfg, iter_fn, r, t,
            _degenerate_global(src_valid_l, cand_valid_l), history)

        coords = jnp.concatenate([t_f, geo.bso3_log(r_f)], axis=-1)
        particles = jax.lax.all_gather(coords, PARTICLE_AXIS, tiled=True)  # [P,6]
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
            P(POINT_AXIS, None),          # source [B,3]
            P(POINT_AXIS),                # src_valid [B]
            P(POINT_AXIS, None, None),    # cand_pts [B,K,3]
            P(POINT_AXIS, None),          # cand_valid [B,K]
            P(None, None),                # r0
            P(None),                      # t0
            P(PARTICLE_AXIS, None),       # init particles [P,6]
        ),
        out_specs=((result_specs, P(None, None, None)) if history
                   else result_specs),
        check_vma=False,
    )
    return fn(source, src_valid, cand_pts, cand_valid, r0, t0, init_particles)


def sharded_register(
    mesh: Mesh,
    cfg: SteinICPConfig,
    source, src_valid, target, tgt_valid, r0, t0, init_particles,
    history: bool = False,
) -> svn.AlignResult:
    """Distributed `svn.register`: stage-1 KNN runs sharded over source rows
    (each point shard searches the replicated target), then the mesh-parallel
    align. history=True additionally returns the [iters,P,6] particle stack
    (sharded save_particles — see run_align_loop)."""

    def knn_body(source_l, src_valid_l, target_r, tgt_valid_r, r0_l, t0_l):
        source_at_guess = geo.transform_points(r0_l, t0_l, source_l)
        idx, d2 = knn.find_candidates(cfg, source_at_guess, target_r,
                                      src_valid_l, tgt_valid_r)
        return idx, d2

    idx, d2 = jax.shard_map(
        knn_body,
        mesh=mesh,
        in_specs=(P(POINT_AXIS, None), P(POINT_AXIS), P(None, None), P(None),
                  P(None, None), P(None)),
        out_specs=(P(POINT_AXIS, None), P(POINT_AXIS, None)),
        check_vma=False,
    )(source, src_valid, target, tgt_valid, r0, t0)
    cand_pts, cand_valid = knn.gather_candidates(target, idx, d2)
    return sharded_align(mesh, cfg, source, src_valid, cand_pts, cand_valid,
                         r0, t0, init_particles, history=history)
