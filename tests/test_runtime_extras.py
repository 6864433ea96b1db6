"""Tests for records, host buffers, and the keyframe pose graph."""

import io as pyio
import json

import jax.numpy as jnp
import numpy as np

from svnicp_tpu.core import geometry as geo
from svnicp_tpu.io import records
from svnicp_tpu.runtime import buffers, posegraph


class TestBuffers:
    def test_fifo_and_nearest(self):
        b = buffers.TimedRingBuffer(capacity=5)
        for i in range(8):
            b.push(f"v{i}", float(i))
        assert len(b) == 5  # capacity bound: oldest dropped
        v, t = b.pop_first()
        assert v == "v3" and t == 3.0
        v, t = b.nearest(5.4)
        assert v == "v5"
        v, t = b.nearest(100.0)
        assert v == "v7"
        v, t = b.at(99)
        assert v == "v7"  # clamps like the reference's id fallback
        assert len(b.drain()) == 4
        assert len(b) == 0


class TestRecords:
    def test_quaternion_roundtrip(self, rng):
        from scipy.spatial.transform import Rotation as sr

        for _ in range(10):
            r = sr.random(random_state=rng.integers(1 << 30)).as_matrix()
            w, x, y, z = records.quaternion_from_matrix(r)
            back = sr.from_quat([x, y, z, w]).as_matrix()
            np.testing.assert_allclose(back, r, atol=1e-6)

    def test_jsonl_writer(self):
        buf = pyio.StringIO()
        w = records.JSONLWriter(buf)
        w.write(records.RuntimeRecord(stamp=1.0, preprocessing_time=0.01,
                                      steinicp_time=0.1))
        line = json.loads(buf.getvalue())
        assert line["_type"] == "RuntimeRecord"
        assert line["steinicp_time"] == 0.1

    def test_particle_record(self):
        p = np.arange(12).reshape(2, 6).astype(float)
        rec = records.ParticleRecord.from_particles(0.5, p, [0.5, 0.5])
        assert rec.x == [0.0, 6.0]
        assert rec.yaw == [5.0, 11.0]


class TestPoseGraph:
    def _noisy_loop_graph(self, rng, n=30, drift=0.02):
        """Square loop trajectory with odometry drift + one loop closure."""
        g = posegraph.PoseGraph(keyframe_trans_threshold=0.0,
                                keyframe_rot_threshold=0.0, loop_min_separation=5)
        true_poses = []
        r = np.eye(3)
        t = np.zeros(3)
        for i in range(n):
            true_poses.append((r.copy(), t.copy()))
            yaw = 2 * np.pi / n
            dr = np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.0, yaw])))
            t = t + r @ np.array([1.0, 0.0, 0.0])
            r = r @ dr
        # odometry with accumulating drift
        est_r, est_t = np.eye(3), np.zeros(3)
        g.maybe_add_keyframe(0.0, est_r, est_t)
        for i in range(1, n):
            pr, pt = true_poses[i - 1]
            cr, ct = true_poses[i]
            rel_r = pr.T @ cr
            rel_t = pr.T @ (ct - pt) + rng.normal(scale=drift, size=3)
            est_t = est_t + est_r @ rel_t
            est_r = est_r @ rel_r
            g.maybe_add_keyframe(float(i), est_r, est_t)
        return g, true_poses

    def test_keyframe_selection_thresholds(self):
        g = posegraph.PoseGraph(keyframe_trans_threshold=1.0)
        assert g.maybe_add_keyframe(0.0, np.eye(3), np.zeros(3))
        assert not g.maybe_add_keyframe(0.1, np.eye(3), np.array([0.5, 0, 0]))
        assert g.maybe_add_keyframe(0.2, np.eye(3), np.array([1.5, 0, 0]))
        assert len(g.nodes_r) == 2
        assert len(g.edges) == 1

    def test_loop_closure_reduces_error(self, rng):
        g, true_poses = self._noisy_loop_graph(rng)
        # ground truth: last pose closes the loop back near the start
        drift_before = np.linalg.norm(g.nodes_t[-1] - true_poses[-1][1])
        # add the loop edge from the true relative pose (last -> first)
        pr, pt = true_poses[-1]
        rel_r = pr.T @ true_poses[0][0]
        rel_t = pr.T @ (true_poses[0][1] - pt)
        g.add_loop_edge(len(g.nodes_r) - 1, 0, rel_r.T.T, rel_t,
                        cov=1e-4 * np.eye(6))
        # note: edge direction (i=last, j=first) with measurement T_last^-1 T_first
        g.optimize(iterations=8)
        drift_after = np.linalg.norm(g.nodes_t[-1] - true_poses[-1][1])
        assert drift_after < drift_before * 0.7
        # first node stays fixed (gauge)
        np.testing.assert_allclose(g.nodes_t[0], 0.0, atol=1e-5)

    def test_loop_candidates(self, rng):
        g, _ = self._noisy_loop_graph(rng, n=30, drift=0.0)
        cands = g.loop_candidates()
        assert any(j == len(g.nodes_r) - 1 and i <= 2 for i, j in cands)
