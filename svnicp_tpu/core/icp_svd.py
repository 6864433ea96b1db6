"""Classic closed-form (SVD / Kabsch) ICP — the third registration method.

North-star component (BASELINE.json: "point-to-point ... SVD/Gauss-Newton
pose updates on SE(3)"; config 1 is a single-particle classic ICP): the
reference implements only the SVGD/SVN particle methods, so this module has
no reference analogue beyond reusing the same two-stage correspondence
machinery (candidate pre-pairing per SVGDICP.cpp:176-215, per-iteration 1-NN
per SVGDICP.cpp:300-329) and the same robust weight / distance gate.

Design: a multi-start ensemble of independent Kabsch ICP runs, vmapped over
the particle axis. Every particle starts from its own prior perturbation and
each iteration solves the *absolute* weighted closed-form alignment of its
current matches — no linearization, no step size. P=1 is textbook ICP; P>1
yields a spread over basins that populates AlignResult.var/cov exactly like
the Stein methods (without kernel coupling — the starts never interact).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import residuals
from svnicp_tpu.core.svn import AlignResult, ensemble_result
from svnicp_tpu.kernels import knn


class _LoopState(NamedTuple):
    r: jax.Array          # [P,3,3] local rotation (relative to the guess)
    t: jax.Array          # [P,3]
    it: jax.Array         # scalar int32
    delta: jax.Array      # scalar: mean pose-update magnitude at last iter
    done: jax.Array       # scalar bool


def _kabsch_iteration(cfg: SteinICPConfig, source, src_valid, cand_pts,
                      cand_valid, r0, t0, state):
    """One sweep: per-particle 1-NN -> robust weights -> closed-form pose."""
    r_total = jnp.matmul(r0[None], state.r, precision=jax.lax.Precision.HIGHEST)
    t_total = t0[None] + jnp.einsum("ij,pj->pi", r0, state.t)
    transformed = (
        jnp.einsum("pij,bj->pbi", r_total, source,
                   precision=jax.lax.Precision.HIGHEST)
        + t_total[:, None, :]
    )
    nn_idx, nn_d2 = knn.nn_among_candidates(transformed, cand_pts, cand_valid)
    matched = cand_pts[jnp.arange(source.shape[0])[None, :], nn_idx]  # [P,B,3]
    # reference quirk kept for consistency with svn.py: the gate compares
    # squared distance against the un-squared max_dist
    pair_valid = (nn_d2 < cfg.max_dist) & jnp.isfinite(nn_d2)
    err = jnp.sqrt(jnp.maximum(nn_d2, 0.0))[..., None]
    w = residuals.robust_weight(err, cfg.max_dist)[..., 0]
    w = w * (pair_valid & src_valid[None, :]).astype(source.dtype)

    r_abs, t_abs = jax.vmap(geo.kabsch, in_axes=(None, 0, 0))(source, matched, w)
    # back to local coordinates relative to the guess (r0, t0)
    r_loc = jnp.einsum("ji,pjk->pik", r0, r_abs)
    t_loc = jnp.einsum("ji,pj->pi", r0, t_abs - t0[None])
    return r_loc, t_loc


@functools.partial(jax.jit, static_argnames=("cfg",))
def align(
    cfg: SteinICPConfig,
    source: jax.Array,        # [B,3] source points (scan frame)
    src_valid: jax.Array,     # [B] bool
    cand_pts: jax.Array,      # [B,K,3] stage-1 candidate target points
    cand_valid: jax.Array,    # [B,K] bool
    r0: jax.Array,            # [3,3] initial-guess rotation
    t0: jax.Array,            # [3] initial-guess translation
    init_particles: jax.Array,  # [P,6] prior perturbations [t, log R]
) -> AlignResult:
    """Run multi-start Kabsch ICP to convergence; same contract as svn.align."""
    r_init = geo.bso3_exp(init_particles[:, 3:])
    t_init = init_particles[:, :3]
    iteration = functools.partial(
        _kabsch_iteration, cfg, source, src_valid, cand_pts, cand_valid, r0, t0
    )

    def cond(state: _LoopState):
        return (~state.done) & (state.it < cfg.iterations)

    def body(state: _LoopState):
        r_new, t_new = iteration(state)
        # convergence: mean se3 distance between consecutive absolute poses
        dt = jnp.linalg.norm(t_new - state.t, axis=-1)
        dr = jnp.linalg.norm(
            geo.bso3_log(jnp.einsum("pji,pjk->pik", state.r, r_new)), axis=-1
        )
        delta = jnp.mean(dt + dr)
        done = jnp.asarray(cfg.early_stop) & (delta < cfg.convergence_threshold)
        return _LoopState(r_new, t_new, state.it + 1, delta, done)

    init = _LoopState(
        r_init, t_init, jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, source.dtype), jnp.zeros((), bool),
    )
    final = jax.lax.while_loop(cond, body, init)
    return ensemble_result(final.r, final.t, final.it, final.delta)


def register(
    cfg: SteinICPConfig,
    source: jax.Array,
    src_valid: jax.Array,
    target: jax.Array,
    tgt_valid: jax.Array,
    r0: jax.Array,
    t0: jax.Array,
    init_particles: jax.Array,
) -> AlignResult:
    """Candidate pre-pairing + multi-start SVD ICP (same contract as
    svn.register)."""
    source_at_guess = geo.transform_points(r0, t0, source)
    cand_pts, cand_valid = knn.find_candidate_points(
        cfg, source_at_guess, target, src_valid, tgt_valid)
    return align(cfg, source, src_valid, cand_pts, cand_valid, r0, t0,
                 init_particles)
