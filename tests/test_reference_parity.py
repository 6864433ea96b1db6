"""Transcript parity: a direct numpy/f64 transcription of the reference's
SVN-ICP iteration (SVNICP.cpp stein_align + Newton_grad_right + svgd_grad /
svn_full_grad + pose_update) run against `svn.align` on identical inputs.

This is the strongest guard against sign/order/formula drift: every epoch of
the two implementations must agree to f32 tolerance. The transcription
follows the reference C++ line-by-line (cited); the framework code follows
the TPU design — agreement proves the redesign preserved the math.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo, svn
from svnicp_tpu.kernels import knn


def np_so3_exp(w):
    a = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if a < 1e-12:
        return np.eye(3) + W
    return np.eye(3) + np.sin(a) / a * W + (1 - np.cos(a)) / a**2 * (W @ W)


def np_left_jacobian(w):
    a = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if a < 1e-12:
        return np.eye(3) + 0.5 * W
    return (np.eye(3) + (1 - np.cos(a)) / a**2 * W
            + (a - np.sin(a)) / a**3 * (W @ W))


def np_so3_log(R):
    cos_a = np.clip(0.5 * (np.trace(R) - 1), -1, 1)
    a = np.arccos(cos_a)
    vee = 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    if abs(np.sin(a)) < 1e-12:
        return vee * 2 * (1 + a * a / 6) / 2  # small-angle
    return a / np.sin(a) * vee


def reference_svn_align(source, cand_pts, cand_valid, r0, t0, init, cfg, n_iters,
                        full_grad=False):
    """Numpy transcription of SVNICP.cpp:41-114 (+ helpers). Returns the
    per-epoch particle stack [iters, P, 6] in [t, log R] coordinates."""
    p = init.shape[0]
    b_count, k = cand_pts.shape[:2]
    R = np.stack([np_so3_exp(init[i, 3:]) for i in range(p)])      # local rot
    t = init[:, :3].astype(np.float64).copy()
    source = source.astype(np.float64)
    cand = cand_pts.astype(np.float64)
    history = []

    for _ in range(n_iters):
        R_total = np.einsum("ij,pjk->pik", r0, R)                  # :58
        t_total = t0[None] + np.einsum("ij,pj->pi", r0, t)         # :59
        transformed = np.einsum("pij,bj->pbi", R_total, source) + t_total[:, None]

        # get_correspondence_fast: 1-NN among candidates (SVGDICP.cpp:300-329)
        d2 = ((transformed[:, :, None, :] - cand[None]) ** 2).sum(-1)
        d2[:, ~cand_valid] = np.inf
        idx = d2.argmin(-1)
        dmin = np.take_along_axis(d2, idx[..., None], -1)[..., 0]
        matched = cand[np.arange(b_count)[None, :], idx]
        gate = (dmin < cfg.max_dist)[..., None]                    # squared-dist quirk

        src_g = np.where(gate, source[None], 0.0)                  # point_filter
        trans_g = np.where(gate, transformed, 0.0)
        tgt_g = np.where(gate, matched, 0.0)

        # Newton_grad_right (SVNICP.cpp:116-164)
        err = trans_g - tgt_g
        en = np.linalg.norm(err, axis=-1, keepdims=True)
        w = (cfg.max_dist / (cfg.max_dist + 3 * en)) ** 2
        err = w * err
        H = np.zeros((p, 6, 6))
        bvec = np.zeros((p, 6))
        for pi in range(p):
            s_hat = np.zeros((b_count, 3, 3))
            s = src_g[pi]
            s_hat[:, 0, 1] = -s[:, 2]; s_hat[:, 0, 2] = s[:, 1]
            s_hat[:, 1, 0] = s[:, 2]; s_hat[:, 1, 2] = -s[:, 0]
            s_hat[:, 2, 0] = -s[:, 1]; s_hat[:, 2, 1] = s[:, 0]
            Rc = R_total[pi]
            J = np.concatenate(
                [np.broadcast_to(Rc, (b_count, 3, 3)),
                 -np.einsum("ij,bjk->bik", Rc, s_hat)], axis=2)
            H[pi] = np.einsum("bik,bil,b->kl", J, J, w[pi, :, 0]) + 1e-6 * np.eye(6)
            bvec[pi] = np.einsum("bik,bi->k", J, err[pi])
        newton = np.stack([np.linalg.solve(H[i], bvec[i]) for i in range(p)])

        # particle coords [t, log R] (:74-77)
        coords = np.concatenate(
            [t, np.stack([np_so3_log(R[i]) for i in range(p)])], axis=1)

        # couplings
        diff = coords[:, None, :] - coords[None, :, :]
        sq = (diff**2).sum(-1)
        med = np.sort(sq.reshape(-1))[(p * p - 1) // 2]            # torch lower median
        h_bw = max(med / np.log(p + 1), 1e-12)
        K = np.exp(-sq / h_bw)
        if full_grad:                                              # svn_full_grad :229-252
            gk = 2 / h_bw * diff * K[..., None]
            grad2 = np.einsum("ijk,ijl->ikl", gk, gk)
            Hbar = (np.einsum("ij,jkl->ikl", K**2, H) + grad2) / p
            drive = (K @ (-bvec) + gk.sum(1)) / p
            stein = cfg.lr * np.stack(
                [np.linalg.solve(Hbar[i], drive[i]) for i in range(p)])
        else:                                                      # svgd_grad :218-227
            Hm = H.mean(0)
            gk = 2 / h_bw * np.einsum("ijd,ij->id", diff, K)
            stein = (K @ (-newton) + np.linalg.solve(Hm, gk.T).T) / K.sum(1, keepdims=True)

        # pose_update (:268-279): R <- R exp(w), t <- R_new (J_l dt) + t
        for i in range(p):
            dR = np_so3_exp(stein[i, 3:])
            Jl = np_left_jacobian(stein[i, 3:])
            R[i] = R[i] @ dR
            t[i] = R[i] @ (Jl @ stein[i, :3]) + t[i]
        history.append(np.concatenate(
            [t, np.stack([np_so3_log(R[i]) for i in range(p)])], axis=1))
    return np.stack(history)


def make_problem(rng, n=300):
    cloud = rng.normal(size=(n, 3)).astype(np.float32) * 5
    cloud[:100, 2] = 0.0
    cloud[100:200, 1] = 4.0
    xi = np.array([0.1, -0.06, 0.03, 0.01, -0.01, 0.02], np.float32)
    r, t = geo.se3_exp(jnp.asarray(xi))
    target = np.asarray(geo.transform_points(r, t, jnp.asarray(cloud)))
    return cloud, target


def run_both(rng, full_grad, iters=6, p=4):
    cloud, target = make_problem(rng)
    n = len(cloud)
    cfg = SteinICPConfig(particle_count=p, iterations=iters, lr=1.0, max_dist=2.8,
                         knn_count=16, early_stop=False, svn_full_grad=full_grad,
                         candidate_method="topk")
    init = np.asarray(
        svn.init_particles_uniform(jax.random.PRNGKey(7), p, cfg.init_lb, cfg.init_ub)
    )
    # identical candidate sets for both
    idx, d2 = knn.knn_candidates(jnp.asarray(cloud), jnp.asarray(target),
                                 jnp.ones(n, bool), jnp.ones(n, bool), cfg.knn_count)
    cand_pts, cand_valid = knn.gather_candidates(jnp.asarray(target), idx, d2)

    _, history = svn.align_with_history(
        cfg, jnp.asarray(cloud), jnp.ones(n, bool), cand_pts, cand_valid,
        jnp.eye(3), jnp.zeros(3), jnp.asarray(init),
    )
    ours = np.asarray(history)[:iters]

    ref = reference_svn_align(
        cloud, np.asarray(cand_pts), np.asarray(cand_valid),
        np.eye(3), np.zeros(3), init.astype(np.float64), cfg, iters,
        full_grad=full_grad,
    )
    return ours, ref


def test_svgd_coupling_transcript_parity(rng):
    ours, ref = run_both(rng, full_grad=False)
    # per-epoch agreement within f32 accumulation tolerance
    for e in range(len(ref)):
        np.testing.assert_allclose(ours[e], ref[e], atol=5e-4,
                                   err_msg=f"epoch {e}")


def test_svn_full_grad_transcript_parity(rng):
    ours, ref = run_both(rng, full_grad=True)
    for e in range(len(ref)):
        np.testing.assert_allclose(ours[e], ref[e], atol=1e-3,
                                   err_msg=f"epoch {e}")


def test_single_particle_newton_transcript(rng):
    ours, ref = run_both(rng, full_grad=False, p=1)
    np.testing.assert_allclose(ours[-1], ref[-1], atol=5e-4)
