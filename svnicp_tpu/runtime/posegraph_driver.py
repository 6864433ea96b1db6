"""Pose-graph side of the host driver: keyframing, loop verification,
re-anchoring the live odometry state.

Split out of runtime/pipeline.py (round 5): `LIOPipeline` mixes this in.
The graph itself (nodes/edges/GN optimizer) lives in runtime/posegraph.py;
this module is the glue that runs it alongside odometry — keyframe
selection from frame outputs, SVN-ICP loop verification between stored
keyframe clouds, and the rigid re-anchor of the persistent device state
(pose history, ESKF nav, voxel map) by the optimized correction.

North-star addition over the reference (BASELINE config 4): the reference's
trajectory is pure odometry (no graph, no re-anchor). The safety rails here
— correction rejection bounds, graph rollback, offending-edge pruning —
came out of the round-4 lost-run experiments (BASELINE.md loop-closure
negative result): a lost system must not destroy itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.config import PipelineConfig


@functools.partial(jax.jit, static_argnames=("cfg", "move_map"))
def _reanchor_state(cfg: PipelineConfig, state,
                    delta_r: jax.Array, delta_t: jax.Array,
                    move_map: bool = True):
    """Rigidly move the persistent odometry state by a world-frame correction
    (pose-graph re-anchor): pose history, ESKF nav state, and the voxel map
    (keys recomputed, table re-sorted to restore the key-sorted invariant).

    The ESKF covariance is left untouched: every error state in this filter
    is BODY-frame (pose injection T*exp(delta), velocity r_new @ dv —
    core/eskf.py update), so a left world-frame rigid move does not rotate
    the error distribution. The world-frame velocity does rotate.

    ``move_map=False`` skips the map move for the sharded-map mode, where
    the map lives in key-range blocks and moves via
    `voxmap_sharded.sharded_reanchor` (its own collective dispatch).
    """
    from svnicp_tpu.core import imu as imu_mod
    from svnicp_tpu.core import voxmap

    dtype = jnp.dtype(cfg.dtype)
    dr = delta_r.astype(dtype)
    dt = delta_t.astype(dtype)

    def move(r, t):
        return dr @ r, dr @ t + dt

    pose_r, pose_t = move(state.pose_r, state.pose_t)
    prev_r, prev_t = move(state.prev_r, state.prev_t)
    nav = state.eskf.nav
    nav_r, nav_t = move(nav.r, nav.t)
    ekf = state.eskf._replace(
        nav=imu_mod.NavState(nav_r, nav_t, dr @ nav.v))
    state = state._replace(
        pose_r=pose_r, pose_t=pose_t, prev_r=prev_r, prev_t=prev_t, eskf=ekf)
    if not move_map:
        return state

    from svnicp_tpu.core.pointcloud import INVALID_KEY, voxel_key

    pts = state.vmap.points @ dr.T + dt[None, :]
    key = jnp.where(state.vmap.valid,
                    voxel_key(pts, cfg.map.voxel_size), INVALID_KEY)
    skey, sx, sy, sz = jax.lax.sort(
        (key, pts[:, 0], pts[:, 1], pts[:, 2]), num_keys=1, is_stable=True)
    valid = skey != INVALID_KEY
    new_map = voxmap.VoxelMap(
        jnp.where(valid[:, None], jnp.stack([sx, sy, sz], axis=-1), 0.0),
        skey, valid)
    return state._replace(vmap=new_map)


class PoseGraphDriver:
    """Mixin for LIOPipeline: keyframe selection + loop-closure
    search/verification + live re-anchoring. Expects the host attributes
    initialized in LIOPipeline.__post_init__ (posegraph, _keyframe_clouds,
    loop_closures, reanchors*, loop_edges_pruned, state, mesh, cfg)."""

    _KF_CLOUD_SIZE = 2048

    def _update_posegraph(self, t: float, out, raw_points) -> None:
        """Keyframe selection + loop-closure search/verification.

        The graph runs alongside odometry: loop edges come from an SVN-ICP
        registration between stored keyframe clouds, gated on convergence;
        `optimized_trajectory()` returns the corrected keyframe path (the
        live map is not rebuilt — BASELINE config 4 scope)."""
        added = self.posegraph.maybe_add_keyframe(
            t, np.asarray(out.pose_r), np.asarray(out.pose_t), np.asarray(out.cov)
        )
        if not added:
            return
        pts = np.asarray(raw_points, np.float32)
        if len(pts) > self._KF_CLOUD_SIZE:
            step = len(pts) // self._KF_CLOUD_SIZE
            pts = pts[::step][: self._KF_CLOUD_SIZE]
        pad = np.zeros((self._KF_CLOUD_SIZE, 3), np.float32)
        pad[: len(pts)] = pts
        valid = np.zeros(self._KF_CLOUD_SIZE, bool)
        valid[: len(pts)] = True
        self._keyframe_clouds.append((pad, valid))

        kf_idx = len(self.posegraph.nodes_r) - 1
        accepted = False
        for old, cur in self.posegraph.loop_candidates()[:2]:
            z = self._verify_loop(old, cur)
            if z is not None:
                rel_r, rel_t, cov = z
                self.posegraph.add_loop_edge(old, cur, rel_r, rel_t, cov)
                self.loop_closures.append((old, cur))
                accepted = True
        if accepted or (
            kf_idx > 0 and kf_idx % self.cfg.posegraph.optimize_every == 0
            and self.loop_closures
        ):
            # snapshot ALL nodes, not just the last: if the optimized
            # correction is rejected by apply_reanchor's sanity guard, the
            # graph must roll back too — otherwise its nodes live in the
            # optimized frame while new keyframes keep arriving in the
            # uncorrected live frame, every subsequent optimize sees the
            # un-applied jump as apparent motion, and reanchoring stays
            # wedged (huge corrections re-rejected) for the rest of the run
            snap_r = [r.copy() for r in self.posegraph.nodes_r]
            snap_t = [t.copy() for t in self.posegraph.nodes_t]
            self.posegraph.optimize(iterations=8)
            if self.cfg.posegraph.reanchor:
                rejected_before = self.reanchors_rejected
                self._reanchor_live(snap_r[-1], snap_t[-1])
                if self.reanchors_rejected != rejected_before:
                    self.posegraph.nodes_r = snap_r
                    self.posegraph.nodes_t = snap_t
                    # drop the loop edges that drove the rejected correction
                    # (whitened residual far outside the Huber region at the
                    # rolled-back nodes) so the graph can recover if later
                    # closures are sane — otherwise every optimize at the
                    # cadence re-derives the same rejected jump and closure
                    # stays wedged for the rest of the run
                    self.loop_edges_pruned += self.posegraph.prune_loop_edges(
                        5.0 * self.cfg.posegraph.huber_delta)

    def _reanchor_live(self, before_r: np.ndarray, before_t: np.ndarray) -> None:
        """Apply the last keyframe's optimization delta to the LIVE estimate:
        the current odometry chain hangs off that keyframe, so the world-frame
        correction T_opt T_before^-1 rigidly moves the pose history, the ESKF
        nav state and the voxel map (keys are recomputed and the table
        re-sorted). Loop closures then correct future odometry, not just
        `optimized_trajectory()`."""
        after_r = self.posegraph.nodes_r[-1]
        after_t = self.posegraph.nodes_t[-1]
        delta_r = after_r @ before_r.T
        delta_t = after_t - delta_r @ before_t
        if (np.linalg.norm(delta_t) < 1e-6
                and np.linalg.norm(delta_r - np.eye(3)) < 1e-6):
            return
        self.apply_reanchor(delta_r, delta_t)

    def apply_reanchor(self, delta_r, delta_t) -> None:
        """Rigidly move the live odometry state (pose history, ESKF nav, and
        the voxel map) by a world-frame correction. On the sharded map the
        move runs distributed: per-shard re-key + the rebalance ring pass
        (`voxmap_sharded.sharded_reanchor`) routes rows whose new key left
        the shard's range to their owner; boundaries stay fixed.

        A non-finite correction is REJECTED, not applied: when odometry is
        fully lost, spurious "loop" registrations can converge in a wrong
        basin and the optimized graph can go non-finite — feeding that into
        the live map would destroy the one state that could still recover."""
        bound = self.cfg.posegraph.max_reanchor_correction
        dr_np, dt_np = np.asarray(delta_r), np.asarray(delta_t)
        # rotation bound: a legitimate closure correction's rotation is
        # drift-scale; 1 rad of heading correction means the system was
        # already lost (bound fixed rather than configurable — no sane
        # operating point wants rigid map rotations beyond it)
        cos_a = np.clip((np.trace(dr_np) - 1.0) / 2.0, -1.0, 1.0)
        if not (np.isfinite(dr_np).all() and np.isfinite(dt_np).all()
                and np.linalg.norm(dt_np) <= bound
                and np.arccos(cos_a) <= 1.0):
            self.reanchors_rejected += 1
            return
        dt = jnp.dtype(self.cfg.dtype)
        dr_j, dt_j = jnp.asarray(delta_r, dt), jnp.asarray(delta_t, dt)
        sharded_map = self.mesh is not None and self.cfg.map.sharded
        self.state = _reanchor_state(self.cfg, self.state, dr_j, dt_j,
                                     move_map=not sharded_map)
        if sharded_map:
            from svnicp_tpu.parallel import voxmap_sharded as vms

            new_map, dropped = vms.sharded_reanchor(
                self.mesh, self.state.vmap, self.state.split_keys,
                dr_j, dt_j, self.cfg.map.voxel_size)
            self.state = self.state._replace(vmap=new_map)
            if int(dropped):
                import sys

                print(f"[svnicp] WARNING: sharded reanchor dropped "
                      f"{int(dropped)} map rows on shard-capacity overflow "
                      f"(parity loss vs the replicated move)",
                      file=sys.stderr)
            self.reanchor_drops += int(dropped)
        self.reanchors += 1

    def _verify_loop(self, old: int, cur: int):
        """Register keyframe `cur`'s cloud onto keyframe `old`'s cloud; accept
        when the ensemble converges (grad norm below loop_max_grad)."""
        import dataclasses as _dc

        from svnicp_tpu.core import geometry as geo
        from svnicp_tpu.core import svn

        src_pts, src_valid = self._keyframe_clouds[cur]
        tgt_pts, tgt_valid = self._keyframe_clouds[old]
        r_old = np.asarray(self.posegraph.nodes_r[old])
        t_old = np.asarray(self.posegraph.nodes_t[old])
        r_cur = np.asarray(self.posegraph.nodes_r[cur])
        t_cur = np.asarray(self.posegraph.nodes_t[cur])
        guess_r = r_old.T @ r_cur
        guess_t = r_old.T @ (t_cur - t_old)

        pg = self.cfg.posegraph
        loop_cfg = _dc.replace(
            self.cfg.icp, particle_count=pg.loop_particles,
            iterations=pg.loop_iterations, knn_count=pg.loop_knn,
            early_stop=True, use_pallas=pg.loop_use_pallas,
            source_capacity=self._KF_CLOUD_SIZE,
            target_capacity=self._KF_CLOUD_SIZE,
        )
        p = pg.loop_particles
        dt = jnp.dtype(self.cfg.dtype)
        res = svn.register(
            loop_cfg,
            jnp.asarray(src_pts, dt), jnp.asarray(src_valid),
            jnp.asarray(tgt_pts, dt), jnp.asarray(tgt_valid),
            jnp.asarray(guess_r, dt), jnp.asarray(guess_t, dt),
            jnp.asarray(
                np.random.default_rng(cur).uniform(-0.05, 0.05, (p, 6)), dt,
            ),
        )
        if not bool(jnp.isfinite(res.mean).all()) or (
            float(res.grad_norm) > self.cfg.posegraph.loop_max_grad
        ):
            return None
        rc = np.asarray(geo.so3_exp(res.mean[3:]))
        tc = np.asarray(res.mean[:3])
        rel_r = guess_r @ rc
        rel_t = guess_r @ tc + guess_t
        return rel_r, rel_t, np.asarray(res.cov)

    def optimized_trajectory(self) -> np.ndarray:
        """[K,4,4] pose-graph-optimized keyframe trajectory (empty when the
        graph is disabled)."""
        if self.posegraph is None:
            return np.zeros((0, 4, 4))
        return self.posegraph.trajectory()
