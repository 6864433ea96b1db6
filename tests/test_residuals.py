"""Gauss-Newton assembly tests: the block-moment H/b must equal the naive
materialized-Jacobian contraction used by the reference (SVNICP.cpp:116-164)."""

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import residuals


def naive_system(source, transformed, target, pair_valid, r_total, max_dist):
    """Direct transcription of the reference einsum math (numpy, f64)."""
    gate = pair_valid[:, None].astype(np.float64)
    s = np.asarray(source, np.float64) * gate
    e = (np.asarray(transformed, np.float64) - np.asarray(target, np.float64)) * gate
    en = np.linalg.norm(e, axis=-1, keepdims=True)
    w = (max_dist / (max_dist + 3.0 * en)) ** 2
    we = w * e
    b_count = s.shape[0]
    s_hat = np.zeros((b_count, 3, 3))
    for i in range(b_count):
        x, y, z = s[i]
        s_hat[i] = [[0, -z, y], [z, 0, -x], [-y, x, 0]]
    rc = np.asarray(r_total, np.float64)
    j = np.concatenate([np.broadcast_to(rc, (b_count, 3, 3)), -rc @ s_hat], axis=2)  # [B,3,6]
    h = np.einsum("bik,bil,b->kl", j, j, w[:, 0]) + 1e-6 * np.eye(6)
    b = np.einsum("bik,bi->k", j, we)
    return h, b


def test_block_moment_identity(rng):
    b_count = 50
    source = rng.normal(size=(b_count, 3)).astype(np.float32) * 5
    xi = rng.normal(size=6).astype(np.float32) * 0.1
    r_total, t_total = geo.se3_exp(jnp.asarray(xi))
    transformed = geo.transform_points(r_total, t_total, jnp.asarray(source))
    target = transformed + jnp.asarray(rng.normal(size=(b_count, 3)).astype(np.float32) * 0.1)
    pair_valid = rng.random(b_count) > 0.2

    h, bb = residuals.gauss_newton_system(
        jnp.asarray(source), transformed, target, jnp.asarray(pair_valid),
        jnp.ones(b_count, bool), r_total, 2.8,
    )
    h_ref, b_ref = naive_system(source, np.asarray(transformed), np.asarray(target),
                                pair_valid, np.asarray(r_total), 2.8)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(bb), b_ref, rtol=1e-4, atol=1e-3)


def test_gated_pairs_add_identity_to_translation_block(rng):
    # reference quirk: fully-gated cloud -> H = B*I3 (+jitter) in the top-left
    b_count = 20
    source = rng.normal(size=(b_count, 3)).astype(np.float32)
    r = jnp.eye(3)
    transformed = jnp.asarray(source)
    target = transformed
    h, bb = residuals.gauss_newton_system(
        jnp.asarray(source), transformed, target, jnp.zeros(b_count, bool),
        jnp.ones(b_count, bool), r, 2.8
    )
    np.testing.assert_allclose(np.asarray(h)[:3, :3], b_count * np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.asarray(h)[3:, 3:], 1e-6 * np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bb), 0.0, atol=1e-6)


def test_solver_matches_lstsq(rng):
    h = rng.normal(size=(6, 6))
    h = (h @ h.T + np.eye(6)).astype(np.float32)
    b = rng.normal(size=6).astype(np.float32)
    x = residuals.solve_newton(jnp.asarray(h), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(h, b), rtol=1e-3, atol=1e-4)


def test_cholesky_solve6_batched_and_broadcast(rng):
    """Unrolled batched 6x6 solve vs numpy, incl. [6,6] x [P,6] broadcast."""
    a = rng.normal(size=(16, 6, 6))
    h = (a @ np.swapaxes(a, 1, 2) + 2 * np.eye(6)).astype(np.float32)
    b = rng.normal(size=(16, 6)).astype(np.float32)
    x = residuals.cholesky_solve6(jnp.asarray(h), jnp.asarray(b))
    ref = np.stack([np.linalg.solve(h[i], b[i]) for i in range(16)])
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-3, atol=1e-4)

    h1 = h[0]
    xb = residuals.cholesky_solve6(jnp.asarray(h1), jnp.asarray(b))
    refb = np.stack([np.linalg.solve(h1, b[i]) for i in range(16)])
    np.testing.assert_allclose(np.asarray(xb), refb, rtol=1e-3, atol=1e-4)


def test_cholesky_solve6_rank_deficient_f32_stays_finite():
    """Regression: a REAL rank-2 GN Hessian captured from a segmented-scan
    plane alignment (2 valid pairs + 1e-6 jitter). In f32 the cancellation
    error of O(100) entries exceeds the jitter, so an unguarded Cholesky
    pivot rounds negative -> sqrt NaN that poisoned the whole ensemble
    (jit-/fusion-sensitive: the same input solved eagerly was finite). The
    pivot floor must keep the solve finite; the (huge) step along the
    deficient directions is bounded by svn.clip_step downstream."""
    h_bad = np.array(
        [[0.27815217, 0.2623033, -0.38537744, 3.3678045, 3.857617, 5.0510497],
         [0.2623033, 0.2478187, -0.36476505, 3.1940665, 3.645455, 4.7684026],
         [-0.38537744, -0.36476508, 0.53787744, -4.719208, -5.3670497, -7.01326],
         [3.3678048, 3.1940668, -4.719208, 41.493614, 47.008705, 61.360256],
         [3.8576171, 3.6454551, -5.3670497, 47.008705, 53.627136, 70.13726],
         [5.05105, 4.7684026, -7.01326, 61.360256, 70.13726, 91.7814]],
        np.float32)
    b_bad = np.array([0.01662421, 0.024123777, -0.04776382, 0.5349798,
                      0.37084615, 0.39640346], np.float32)
    x = jax.jit(residuals.cholesky_solve6)(jnp.asarray(h_bad), jnp.asarray(b_bad))
    assert np.isfinite(np.asarray(x)).all()
    # ... and after the trust region the step is a sane magnitude
    from svnicp_tpu.core import svn

    clipped = svn.clip_step(jnp.asarray(x)[None], 3.0)
    assert np.isfinite(np.asarray(clipped)).all()
    assert float(jnp.linalg.norm(clipped)) <= 3.0 + 1e-5


def test_cholesky_solve6_floor_bit_neutral_on_spd(rng):
    """The pivot floor must not change well-conditioned solves at all:
    compare against numpy's f64 solve at f32-roundtrip tolerance on random
    SPD systems of the hot path's scale."""
    j = rng.normal(size=(32, 24, 6)).astype(np.float32)
    h = np.einsum("bki,bkj->bij", j, j) + 1e-6 * np.eye(6, dtype=np.float32)
    b = rng.normal(size=(32, 6)).astype(np.float32)
    x = np.asarray(residuals.cholesky_solve6(jnp.asarray(h), jnp.asarray(b)))
    want = np.linalg.solve(h.astype(np.float64),
                           b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(x, want, rtol=2e-3, atol=1e-5)


def test_plane_normals_reject_collinear_neighborhoods(rng):
    """A plane fit from neighbors along ONE scan-ring arc is rank-1 — its
    smallest eigenvector is arbitrary, so the fit must be flagged invalid
    (the collinearity gate); a genuinely planar 2-D patch stays valid."""
    k = 16
    t = np.linspace(0, 1.5, k)[:, None]
    arc = np.concatenate([t, 0.05 * t ** 2, np.zeros((k, 1))], 1)  # near-line
    patch = np.concatenate([rng.uniform(0, 1, (k, 2)), np.zeros((k, 1))], 1)
    cand = jnp.asarray(np.stack([arc, patch]), jnp.float32)  # [2,K,3]
    cand = cand + jnp.asarray(rng.normal(scale=1e-3, size=(2, k, 3)),
                              jnp.float32)
    normals, valid = residuals.plane_normals(cand, jnp.ones((2, k), bool))
    assert not bool(valid[0]), "collinear arc must be rejected"
    assert bool(valid[1]), "planar patch must stay valid"
    np.testing.assert_allclose(np.abs(np.asarray(normals[1])),
                               [0.0, 0.0, 1.0], atol=0.05)
