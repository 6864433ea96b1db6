"""SO(3)/SE(3) geometry tests: round trips, closed forms, batch consistency.

Oracle strategy per SURVEY.md §4: every Lie op is validated against scipy /
closed-form identities on random inputs including near-singular angles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from svnicp_tpu.core import geometry as geo


def random_w(rng, n, scale=2.0):
    return rng.normal(size=(n, 3)) * scale


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = random_w(rng, 64)
        R = np.asarray(geo.bso3_exp(jnp.asarray(w)))
        R_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        w = random_w(rng, 64, scale=1.0)
        # log is the inverse of exp only inside the injectivity radius |w| < pi
        norms = np.linalg.norm(w, axis=-1, keepdims=True)
        w = w / np.maximum(norms, 1.0) * np.minimum(norms, 0.95 * np.pi)
        w_back = np.asarray(geo.bso3_log(geo.bso3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w_back, w, atol=1e-4)

    def test_small_angle_stable(self):
        for eps in [0.0, 1e-10, 1e-7, 1e-4]:
            w = jnp.array([eps, 0.0, 0.0])
            R = geo.so3_exp(w)
            assert np.all(np.isfinite(np.asarray(R)))
            np.testing.assert_allclose(np.asarray(geo.so3_log(R)), np.asarray(w), atol=1e-6)

    def test_exp_gradient_finite_at_zero(self):
        g = jax.jacobian(lambda w: geo.so3_exp(w))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        # dR/dw at identity is the skew generator
        np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(geo.skew(jnp.eye(3)[0])), atol=1e-6)

    def test_log_gradient_finite_at_identity(self):
        # regression: jacfwd through arccos at the identity poisoned the
        # pose-graph optimizer with NaNs
        g = jax.jacobian(lambda w: geo.so3_log(geo.so3_exp(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), np.eye(3), atol=1e-5)

    def test_left_jacobian_identity(self, rng):
        # J_l(w) satisfies: exp((w + J_l^-1 dw)^) ~ exp(w^) exp(...) — check
        # instead the closed-form identity J_l(w) @ w == w (axis is eigenvector).
        w = jnp.asarray(random_w(rng, 16, scale=1.5))
        Jl = geo.bso3_left_jacobian(w)
        np.testing.assert_allclose(
            np.einsum("nij,nj->ni", np.asarray(Jl), np.asarray(w)), np.asarray(w), atol=1e-5
        )

    def test_left_jacobian_inverse(self, rng):
        w = jnp.asarray(random_w(rng, 16, scale=1.5))
        Jl = geo.bso3_left_jacobian(w)
        Jli = jax.vmap(geo.so3_left_jacobian_inv)(w)
        prod = np.einsum("nij,njk->nik", np.asarray(Jl), np.asarray(Jli))
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-5)

    def test_left_jacobian_finite_difference(self):
        # exp(w + dw) ≈ exp(J_l(w) dw ^) exp(w): check directional consistency
        w = jnp.array([0.3, -0.5, 0.7])
        dw = jnp.array([1e-3, -2e-3, 1.5e-3])
        lhs = geo.so3_exp(w + dw)
        rhs = geo.so3_exp(geo.so3_left_jacobian(w) @ dw) @ geo.so3_exp(w)
        # identity holds to O(|dw|^2); f32 roundoff dominates below ~1e-6
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)))
        R, t = jax.vmap(geo.se3_exp)(xi)
        xi_back = jax.vmap(geo.se3_log)(R, t)
        np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi), atol=1e-5)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=6))
        R, t = geo.se3_exp(xi)
        Ri, ti = geo.transform_inverse(R, t)
        Rc, tc = geo.transform_compose(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-6)

    def test_interpolate_endpoints(self, rng):
        xi0, xi1 = jnp.asarray(rng.normal(size=(2, 6)) * 0.5)
        T0, T1 = geo.se3_exp(xi0), geo.se3_exp(xi1)
        Ra, ta = geo.interpolate_pose(*T0, *T1, 0.0)
        Rb, tb = geo.interpolate_pose(*T0, *T1, 1.0)
        np.testing.assert_allclose(np.asarray(Ra), np.asarray(T0[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tb), np.asarray(T1[1]), atol=1e-5)

    def test_transform_points(self, rng):
        pts = jnp.asarray(rng.normal(size=(100, 3)))
        xi = jnp.asarray(rng.normal(size=6) * 0.3)
        R, t = geo.se3_exp(xi)
        out = geo.transform_points(R, t, pts)
        ref = np.asarray(pts) @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestEuler:
    def test_euler_matches_scipy(self, rng):
        rpy = rng.uniform(-1.2, 1.2, size=(32, 3))
        R = np.asarray(geo.beuler_to_matrix(*[jnp.asarray(rpy[:, i]) for i in range(3)]))
        R_ref = ScipyRot.from_euler("ZYX", rpy[:, ::-1]).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-6)

    def test_euler_roundtrip(self, rng):
        rpy = jnp.asarray(rng.uniform(-1.2, 1.2, size=(32, 3)))
        R = geo.beuler_to_matrix(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        back = geo.bmatrix_to_euler(R)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rpy), atol=1e-5)

    def test_partials_match_finite_difference(self):
        r, p, y = 0.3, -0.4, 0.9
        parts = np.asarray(geo.euler_zyx_partials(jnp.float32(r), jnp.float32(p), jnp.float32(y)))
        eps = 1e-4
        for i, (dr, dp, dy) in enumerate([(eps, 0, 0), (0, eps, 0), (0, 0, eps)]):
            num = (
                np.asarray(geo.euler_zyx_to_matrix(r + dr, p + dp, y + dy))
                - np.asarray(geo.euler_zyx_to_matrix(r - dr, p - dp, y - dy))
            ) / (2 * eps)
            np.testing.assert_allclose(parts[i], num, atol=1e-3)


def test_skew_unskew(rng):
    v = jnp.asarray(rng.normal(size=(8, 3)))
    np.testing.assert_allclose(np.asarray(geo.unskew(geo.skew(v))), np.asarray(v), atol=1e-6)
    # skew(v) @ u == v x u
    u = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(
        np.asarray(geo.skew(v[0]) @ u), np.cross(np.asarray(v[0]), np.asarray(u)), atol=1e-6
    )
