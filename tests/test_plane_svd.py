"""Point-to-plane residuals and closed-form SVD (Kabsch) ICP.

North-star additions (BASELINE.json: "point-to-point and point-to-plane
residuals, SVD/Gauss-Newton pose updates on SE(3)"); the reference implements
neither, so these tests are oracle/property based rather than parity based.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import icp_svd, residuals, svn
from tests.test_svn import CFG, make_structured_cloud, run_registration


class TestPlaneNormals:
    def test_matches_numpy_eigh(self, rng):
        """Numpy oracle replicating the soft local refit (see plane_normals):
        Gaussian reweight by distance to the raw center, then the smallest
        eigenvector of the weighted scatter."""
        b, k = 32, 12
        pts = rng.normal(size=(b, k, 3)).astype(np.float32)
        valid = rng.uniform(size=(b, k)) < 0.8
        valid[:, :3] = True  # ensure >=3 everywhere
        normals, nvalid = residuals.plane_normals(jnp.asarray(pts), jnp.asarray(valid))
        normals, nvalid = np.asarray(normals), np.asarray(nvalid)
        for i in range(b):
            sel = pts[i][valid[i]].astype(np.float64)
            mean0 = sel.mean(axis=0)
            r2 = np.sum((sel - mean0) ** 2, axis=1)
            h = max(r2.mean(), 1e-12)
            w = np.exp(-r2 / h)
            mu = (w[:, None] * sel).sum(0) / w.sum()
            d = sel - mu
            c = (w[:, None, None] * d[:, :, None] * d[:, None, :]).sum(0) / w.sum()
            w_, v_ = np.linalg.eigh(c)
            expect = v_[:, 0]
            if not nvalid[i]:
                continue
            dot = abs(float(np.dot(expect, normals[i])))
            assert dot > 0.999, f"row {i}: |dot|={dot}"

    def test_exact_plane(self, rng):
        n_true = np.array([1.0, 2.0, -0.5])
        n_true /= np.linalg.norm(n_true)
        # points on the plane through origin with normal n_true
        basis = np.linalg.svd(n_true[None])[2][1:]          # [2,3] orthonormal
        coeff = rng.uniform(-1, 1, size=(1, 24, 2)).astype(np.float32)
        pts = jnp.asarray(coeff @ basis, jnp.float32)
        valid = jnp.ones((1, 24), bool)
        normals, nvalid = residuals.plane_normals(pts, valid)
        assert bool(nvalid[0])
        assert abs(float(jnp.dot(normals[0], jnp.asarray(n_true, jnp.float32)))) > 0.9999

    def test_too_few_points_invalid(self):
        pts = jnp.zeros((4, 8, 3))
        valid = jnp.zeros((4, 8), bool).at[:, 0:2].set(True)
        _, nvalid = residuals.plane_normals(pts, valid)
        assert not bool(nvalid.any())


class TestPlaneSystem:
    def test_b_matches_autodiff_gradient(self, rng):
        """b must equal d/dxi of 0.5*sum w r^2 (w frozen) under the same
        right-perturbation convention svn._pose_update applies."""
        bsz = 40
        source = jnp.asarray(rng.normal(size=(bsz, 3)), jnp.float32)
        target = jnp.asarray(rng.normal(size=(bsz, 3)), jnp.float32)
        nrm = rng.normal(size=(bsz, 3))
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        normals = jnp.asarray(nrm, jnp.float32)
        r0, t0 = geo.se3_exp(jnp.asarray([0.1, -0.2, 0.3, 0.05, -0.02, 0.08], jnp.float32))
        valid = jnp.ones((bsz,), bool)
        max_dist = 3.0

        def residual_vec(xi):
            dt, omega = xi[:3], xi[3:]
            r_new = geo.so3_exp(omega)
            t_new = r_new @ (geo.so3_left_jacobian(omega) @ dt)
            r_tot = r0 @ r_new
            t_tot = t0 + r0 @ t_new
            tr = source @ r_tot.T + t_tot
            return jnp.sum(normals * (tr - target), axis=-1)

        r_at0 = residual_vec(jnp.zeros(6))
        w = residuals.robust_weight(jnp.abs(r_at0)[:, None], max_dist)[:, 0]

        def loss(xi):
            r = residual_vec(xi)
            return 0.5 * jnp.sum(jax.lax.stop_gradient(w) * r * r)

        grad = jax.grad(loss)(jnp.zeros(6))
        transformed = source @ r0.T + t0
        h, b = residuals.gauss_newton_system_plane(
            source, transformed, target, normals, valid, r0, max_dist)
        np.testing.assert_allclose(np.asarray(b), np.asarray(grad), rtol=2e-4, atol=2e-5)
        # H (minus jitter) must equal the Gauss-Newton J^T W J
        jac = jax.jacfwd(residual_vec)(jnp.zeros(6))            # [B,6]
        h_ref = jnp.einsum("b,bi,bj->ij", w, jac, jac)
        np.testing.assert_allclose(np.asarray(h - 1e-6 * jnp.eye(6)),
                                   np.asarray(h_ref), rtol=2e-3, atol=2e-4)

    def test_invalid_pairs_drop_out(self, rng):
        bsz = 16
        source = jnp.asarray(rng.normal(size=(bsz, 3)), jnp.float32)
        target = source + 0.1
        normals = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (bsz, 1))
        r0 = jnp.eye(3)
        h0, b0 = residuals.gauss_newton_system_plane(
            source, source, target, normals, jnp.zeros((bsz,), bool), r0, 3.0)
        np.testing.assert_allclose(np.asarray(h0), 1e-6 * np.eye(6), atol=1e-9)
        np.testing.assert_allclose(np.asarray(b0), 0.0, atol=1e-9)


class TestKabsch:
    def test_exact_recovery(self, rng):
        src = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        r_true, t_true = geo.se3_exp(jnp.asarray([0.4, -0.3, 0.2, 0.3, -0.2, 0.5], jnp.float32))
        tgt = src @ r_true.T + t_true
        r, t = geo.kabsch(src, tgt, jnp.ones(50))
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_true), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-5)

    def test_zero_weight_outliers_ignored(self, rng):
        src = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        r_true, t_true = geo.se3_exp(jnp.asarray([0.1, 0.2, -0.1, 0.05, 0.1, -0.2], jnp.float32))
        tgt = src @ r_true.T + t_true
        tgt = tgt.at[:10].add(jnp.asarray(rng.normal(size=(10, 3), scale=5.0), jnp.float32))
        w = jnp.ones(50).at[:10].set(0.0)
        r, t = geo.kabsch(src, tgt, w)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_true), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-5)

    def test_planar_points_stay_proper_rotation(self, rng):
        # rank-2 cross-covariance is the classic reflection trap
        src2 = rng.normal(size=(40, 2)).astype(np.float32)
        src = jnp.asarray(np.concatenate([src2, np.zeros((40, 1), np.float32)], axis=1))
        r_true, t_true = geo.se3_exp(jnp.asarray([0.2, 0.1, -0.3, 0.4, 0.1, 0.2], jnp.float32))
        tgt = src @ r_true.T + t_true
        r, t = geo.kabsch(src, tgt, jnp.ones(40))
        assert float(jnp.linalg.det(r)) > 0.99
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_true), atol=1e-4)


class TestSVDICP:
    def test_single_start_recovers(self, rng):
        cloud = make_structured_cloud(rng)
        cfg = dataclasses.replace(CFG, method="svd", particle_count=1,
                                  convergence_threshold=1e-5)
        true_xi = np.array([0.3, -0.2, 0.1, 0.02, -0.03, 0.05])
        src = jnp.asarray(cloud)
        r_true, t_true = geo.se3_exp(jnp.asarray(true_xi, jnp.float32))
        target = geo.transform_points(r_true, t_true, src)
        init = jnp.zeros((1, 6), jnp.float32)
        res = icp_svd.register(cfg, src, jnp.ones(src.shape[0], bool), target,
                               jnp.ones(target.shape[0], bool),
                               jnp.eye(3), jnp.zeros(3), init)
        rc, tc = geo.so3_exp(res.mean[3:]), res.mean[:3]
        np.testing.assert_allclose(np.asarray(rc), np.asarray(r_true), atol=5e-3)
        np.testing.assert_allclose(np.asarray(tc), np.asarray(t_true), atol=3e-2)
        assert int(res.iterations) < cfg.iterations  # early stop fired

    def test_multi_start_ensemble(self, rng):
        cloud = make_structured_cloud(rng)
        cfg = dataclasses.replace(CFG, method="svd", particle_count=8,
                                  convergence_threshold=1e-5)
        true_xi = np.array([0.2, 0.1, -0.05, 0.01, 0.02, -0.03])
        src = jnp.asarray(cloud)
        r_true, t_true = geo.se3_exp(jnp.asarray(true_xi, jnp.float32))
        target = geo.transform_points(r_true, t_true, src)
        key = jax.random.PRNGKey(0)
        init = svn.init_particles_uniform(key, 8, cfg.init_lb, cfg.init_ub)
        res = icp_svd.register(cfg, src, jnp.ones(src.shape[0], bool), target,
                               jnp.ones(target.shape[0], bool),
                               jnp.eye(3), jnp.zeros(3), init)
        # all starts converge to the same basin on clean data
        assert float(jnp.max(res.var)) < 1e-4
        rc = geo.so3_exp(res.mean[3:])
        np.testing.assert_allclose(np.asarray(rc), np.asarray(r_true), atol=5e-3)


class TestPointToPlaneRegistration:
    def test_svn_plane_residual_recovers(self, rng):
        cloud = make_structured_cloud(rng)
        cfg = dataclasses.replace(CFG, residual="point_to_plane")
        true_xi = np.array([0.3, -0.2, 0.1, 0.02, -0.03, 0.05])
        res, r_fin, t_fin, r_true, t_true = run_registration(cfg, cloud, true_xi)
        np.testing.assert_allclose(r_fin, r_true, atol=1e-2)
        np.testing.assert_allclose(t_fin, t_true, atol=5e-2)

    def test_single_particle_plane_gn(self, rng):
        """BASELINE config 1 shape: single-particle point-to-plane GN ICP."""
        cloud = make_structured_cloud(rng)
        cfg = dataclasses.replace(CFG, residual="point_to_plane",
                                  particle_count=1)
        true_xi = np.array([0.2, 0.15, -0.1, 0.03, 0.01, -0.04])
        res, r_fin, t_fin, r_true, t_true = run_registration(cfg, cloud, true_xi)
        np.testing.assert_allclose(r_fin, r_true, atol=1e-2)
        np.testing.assert_allclose(t_fin, t_true, atol=5e-2)


class TestConfigValidation:
    def test_bad_residual_raises(self):
        with pytest.raises(ValueError):
            SteinICPConfig(residual="point_to_line")

    def test_svd_method_accepted(self):
        assert SteinICPConfig(method="svd").method == "svd"
