"""Keyframe pose graph with on-device Gauss-Newton optimization.

North-star addition (BASELINE.json: "a lightweight pose-graph over keyframes
closes the loop") — the reference has no analogue; its trajectory is pure
odometry. Design:

- keyframes are selected by translation/rotation distance thresholds;
- every consecutive keyframe pair gets an odometry edge whose information
  matrix comes from the SVN-ICP particle covariance (inverse, regularized);
- loop candidates are proposed by radius search over keyframe positions with
  a minimum index separation; callers verify them with an SVN-ICP
  registration and add the resulting relative pose as a loop edge;
- optimization is batched Gauss-Newton over all SE(3) nodes: residual
  e_ij = log(Z_ij^-1 T_i^-1 T_j), dense normal equations (6N x 6N) solved by
  Cholesky — for the few-hundred-keyframe scale this is a single MXU-friendly
  solve, no sparse machinery needed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.core import geometry as geo


@dataclasses.dataclass
class PoseGraph:
    """Host-side container; optimization runs jitted on device."""

    keyframe_trans_threshold: float = 2.0
    keyframe_rot_threshold: float = 0.3   # [rad]
    loop_radius: float = 4.0
    loop_min_separation: int = 20
    # information conditioning (PoseGraphConfig.cov_floor/huber_delta):
    # floor the edge covariance diagonal before inversion (the raw ICP
    # particle covariance is overconfident — BASELINE.md NEES ~88 — and an
    # unfloored bad odometry stretch claims mm-certainty for dm errors and
    # drags the whole graph), and robustify edges with a Huber kernel on
    # the whitened residual norm inside the GN loop.
    cov_floor: float = 4e-4
    huber_delta: float = 3.0

    def __post_init__(self):
        self.nodes_r: list[np.ndarray] = []
        self.nodes_t: list[np.ndarray] = []
        self.stamps: list[float] = []
        self.edges: list[tuple[int, int, np.ndarray, np.ndarray, np.ndarray]] = []
        # each edge: (i, j, rel_r, rel_t, information[6,6])

    # ------------------------------------------------------------------ build

    def maybe_add_keyframe(self, stamp: float, pose_r, pose_t, cov=None) -> bool:
        """Add a keyframe when far enough from the last one; chains an
        odometry edge weighted by the ICP covariance."""
        pose_r = np.asarray(pose_r, np.float64)
        pose_t = np.asarray(pose_t, np.float64)
        if self.nodes_r:
            last_r, last_t = self.nodes_r[-1], self.nodes_t[-1]
            dt = np.linalg.norm(pose_t - last_t)
            dr = np.linalg.norm(
                np.asarray(geo.so3_log(jnp.asarray(last_r.T @ pose_r)))
            )
            if dt < self.keyframe_trans_threshold and dr < self.keyframe_rot_threshold:
                return False
            rel_r = last_r.T @ pose_r
            rel_t = last_r.T @ (pose_t - last_t)
            info = self._information(cov)
            self.edges.append((len(self.nodes_r) - 1, len(self.nodes_r), rel_r, rel_t, info))
        self.nodes_r.append(pose_r)
        self.nodes_t.append(pose_t)
        self.stamps.append(stamp)
        return True

    def _information(self, cov) -> np.ndarray:
        if cov is None:
            return np.eye(6)
        c = np.asarray(cov, np.float64) + self.cov_floor * np.eye(6)
        return np.linalg.inv(c)

    def loop_candidates(self) -> list[tuple[int, int]]:
        """Index pairs (i, j<i-separation) with positions within loop_radius."""
        out = []
        n = len(self.nodes_t)
        if n < self.loop_min_separation + 2:
            return out
        pos = np.stack(self.nodes_t)
        i = n - 1
        d = np.linalg.norm(pos[: i - self.loop_min_separation] - pos[i], axis=1)
        for j in np.nonzero(d < self.loop_radius)[0]:
            out.append((int(j), i))
        return out

    def add_loop_edge(self, i: int, j: int, rel_r, rel_t, cov=None) -> None:
        self.edges.append(
            (i, j, np.asarray(rel_r, np.float64), np.asarray(rel_t, np.float64),
             self._information(cov))
        )

    def prune_loop_edges(self, chi_threshold: float) -> int:
        """Drop loop edges (non-consecutive node pairs) whose whitened
        residual norm at the CURRENT node estimates exceeds chi_threshold;
        returns the number removed.

        Recovery path for a rejected re-anchor: when spurious loop
        registrations (wrong-basin matches on a lost run) drive the
        optimizer to a huge correction that apply_reanchor rejects, the
        offending edges must leave the graph — otherwise every subsequent
        optimize re-derives the same rejected correction and closures stay
        wedged for the rest of the run. An edge consistent with the
        trajectory sits inside the Huber region; offenders are far out in
        the whitened tail, so a generous threshold never prunes sane
        closures."""
        keep = []
        removed = 0
        for e in self.edges:
            i, j, zr, zt, info = e
            if j - i == 1:      # odometry edges are never pruned
                keep.append(e)
                continue
            res = np.asarray(_edge_residual(
                jnp.asarray(self.nodes_r[i]), jnp.asarray(self.nodes_t[i]),
                jnp.asarray(self.nodes_r[j]), jnp.asarray(self.nodes_t[j]),
                jnp.asarray(zr), jnp.asarray(zt)))
            chi = float(np.sqrt(max(res @ np.asarray(info, np.float64) @ res,
                                    0.0)))
            if chi > chi_threshold:
                removed += 1
            else:
                keep.append(e)
        self.edges = keep
        return removed

    # --------------------------------------------------------------- optimize

    def optimize(self, iterations: int = 10) -> None:
        """Gauss-Newton over all nodes (first node fixed); updates in place."""
        n = len(self.nodes_r)
        if n < 2 or not self.edges:
            return
        nodes_r = jnp.asarray(np.stack(self.nodes_r), jnp.float32)
        nodes_t = jnp.asarray(np.stack(self.nodes_t), jnp.float32)
        ei = jnp.asarray([e[0] for e in self.edges], jnp.int32)
        ej = jnp.asarray([e[1] for e in self.edges], jnp.int32)
        zr = jnp.asarray(np.stack([e[2] for e in self.edges]), jnp.float32)
        zt = jnp.asarray(np.stack([e[3] for e in self.edges]), jnp.float32)
        info = jnp.asarray(np.stack([e[4] for e in self.edges]), jnp.float32)
        new_r, new_t = _optimize(nodes_r, nodes_t, ei, ej, zr, zt, info,
                                 iterations, float(self.huber_delta))
        self.nodes_r = [np.asarray(r, np.float64) for r in np.asarray(new_r)]
        self.nodes_t = [np.asarray(t, np.float64) for t in np.asarray(new_t)]

    def trajectory(self) -> np.ndarray:
        mats = []
        for r, t in zip(self.nodes_r, self.nodes_t):
            m = np.eye(4)
            m[:3, :3] = r
            m[:3, 3] = t
            mats.append(m)
        return np.stack(mats) if mats else np.zeros((0, 4, 4))


def _edge_residual(ri, ti, rj, tj, zr, zt):
    """e = log(Z^-1 (T_i^-1 T_j)) in [rho, omega] order."""
    rij = jnp.matmul(ri.T, rj, precision=jax.lax.Precision.HIGHEST)
    tij = ri.T @ (tj - ti)
    er = jnp.matmul(zr.T, rij, precision=jax.lax.Precision.HIGHEST)
    et = zr.T @ (tij - zt)
    return geo.se3_log(er, et)


@functools.partial(jax.jit, static_argnames=("iterations", "huber_delta"))
def _optimize(nodes_r, nodes_t, ei, ej, zr, zt, info, iterations: int,
              huber_delta: float = 0.0):
    n = nodes_r.shape[0]

    def gn_step(carry, _):
        r, t = carry

        def residual_of(xi_flat):
            """Residuals as a function of per-node local updates (for jacfwd):
            T_k <- T_k * exp(xi_k)."""
            xi = xi_flat.reshape(n, 6)
            dr = geo.bso3_exp(xi[:, 3:])
            jl = geo.bso3_left_jacobian(xi[:, 3:])
            r_new = jnp.einsum("nij,njk->nik", r, dr)
            t_new = t + jnp.einsum("nij,njk,nk->ni", r, jl, xi[:, :3])
            res = jax.vmap(_edge_residual)(
                r_new[ei], t_new[ei], r_new[ej], t_new[ej], zr, zt
            )
            return res.reshape(-1)

        zero = jnp.zeros(n * 6, nodes_r.dtype)
        res0 = residual_of(zero)
        jac = jax.jacfwd(residual_of)(zero)            # [E*6, N*6]
        # weighted normal equations, edge-block information applied by einsum
        n_edges = info.shape[0]
        res_e = res0.reshape(n_edges, 6)
        w_info = info
        if huber_delta > 0:
            # Huber robust kernel on the whitened edge norm: outlier edges
            # (bad odometry stretches, wrong loop hypotheses) get weight
            # delta/chi instead of dragging the whole graph — the standard
            # robust pose-graph treatment; IRLS form, re-evaluated each GN
            # iteration on the current residuals
            chi = jnp.sqrt(jnp.maximum(
                jnp.einsum("ei,eij,ej->e", res_e, info, res_e), 1e-12))
            w = jnp.minimum(1.0, huber_delta / chi)
            w_info = info * w[:, None, None]
        jac_e = jac.reshape(n_edges, 6, n * 6)
        wj = jnp.einsum("eij,ejm->eim", w_info, jac_e)
        h = jnp.einsum("ein,eim->nm", jac_e, wj)
        g = jnp.einsum("eim,ei->m", wj, res_e)
        # gauge fixing: clamp node 0 + Levenberg regularization
        mask = jnp.ones(n * 6, nodes_r.dtype).at[:6].set(0.0)
        h = h * mask[:, None] * mask[None, :] + jnp.diag(1e-5 + (1.0 - mask) * 1e5)
        dx = -jnp.linalg.solve(h, g * mask).reshape(n, 6)

        dr = geo.bso3_exp(dx[:, 3:])
        jl = geo.bso3_left_jacobian(dx[:, 3:])
        r_out = jnp.einsum("nij,njk->nik", r, dr)
        t_out = t + jnp.einsum("nij,njk,nk->ni", r, jl, dx[:, :3])
        return (r_out, t_out), jnp.sum(res0 * res0)

    (r_fin, t_fin), _ = jax.lax.scan(gn_step, (nodes_r, nodes_t), None, length=iterations)
    return r_fin, t_fin
