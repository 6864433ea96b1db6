"""Pallas fused 1-NN kernel vs the jnp oracle (interpret mode on CPU,
mirroring the reference's CUDA-vs-CPU KNN oracle pairing, SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.core import geometry as geo, svn
from svnicp_tpu.kernels import nn_pallas


def make_inputs(rng, p=8, b=64, k=128):
    source = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 5)
    cand = jnp.asarray(rng.normal(size=(b, k, 3)).astype(np.float32) * 5)
    valid = jnp.asarray(rng.random((b, k)) > 0.1)
    feat, bias = svn.correspondence_features(source, cand, valid)
    xi = jnp.asarray(rng.normal(size=(p, 6)).astype(np.float32) * 0.1)
    r = geo.bso3_exp(xi[:, 3:])
    t = xi[:, :3]
    params = jnp.concatenate([r.reshape(p, 9), t], axis=-1)
    return params, feat, bias, cand, valid


def test_kernel_matches_oracle(rng):
    params, feat, bias, cand, valid = make_inputs(rng)
    m_ref, s_ref = nn_pallas.fused_nn_match_oracle(params, feat, bias, cand)
    m_ker, s_ker = nn_pallas.fused_nn_match(
        params, feat, bias, cand, particle_tile=4, point_tile=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s_ker), np.asarray(s_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m_ker), np.asarray(m_ref), rtol=1e-4, atol=1e-4)


def test_kernel_with_all_invalid_rows(rng):
    params, feat, bias, cand, valid = make_inputs(rng, b=32)
    bias = bias.at[5].set(jnp.inf)  # every candidate of point 5 invalid
    m_ker, s_ker = nn_pallas.fused_nn_match(
        params, feat, bias, cand, particle_tile=4, point_tile=16, interpret=True
    )
    assert np.isinf(np.asarray(s_ker)[:, 5]).all()
    assert np.isfinite(np.asarray(s_ker)[:, :5]).all()


def test_pad_candidates():
    cand = jnp.zeros((16, 100, 3))
    valid = jnp.ones((16, 100), bool)
    cp, cv = nn_pallas.pad_candidates(cand, valid)
    assert cp.shape == (16, 128, 3)
    assert not np.asarray(cv)[:, 100:].any()


def test_fused_moments_matches_xla_assembly(rng):
    """The fully-fused kernel must reproduce the XLA H/b assembly exactly."""
    from svnicp_tpu.core import residuals

    p, b, k = 8, 64, 128
    source = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 5)
    src_valid = jnp.asarray(rng.random(b) > 0.2)
    cand = jnp.asarray(rng.normal(size=(b, k, 3)).astype(np.float32) * 5)
    cvalid = jnp.asarray(rng.random((b, k)) > 0.1)
    feat, bias = svn.correspondence_features(source, cand, cvalid)
    xi = jnp.asarray(rng.normal(size=(p, 6)).astype(np.float32) * 0.1)
    r = geo.bso3_exp(xi[:, 3:])
    t = xi[:, :3]
    params = jnp.concatenate([r.reshape(p, 9), t], axis=-1)
    max_dist = 2.8

    h_ker, b_ker = nn_pallas.fused_moments(
        params, feat, bias, cand, source, src_valid, max_dist,
        particle_tile=8, point_tile=16, interpret=True,
    )

    # XLA reference path
    m_ref, s_ref = nn_pallas.fused_nn_match_oracle(params, feat, bias, cand)
    transformed = jnp.einsum("pij,bj->pbi", r, source) + t[:, None, :]
    nn_d2 = jnp.maximum(s_ref + jnp.sum(transformed**2, axis=-1), 0.0)
    pair_valid = (nn_d2 < max_dist) & jnp.isfinite(s_ref)
    h_ref, b_ref = residuals.ensemble_gauss_newton(
        source, transformed, m_ref, pair_valid, src_valid, r, max_dist)
    np.testing.assert_allclose(np.asarray(h_ker), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b_ker), np.asarray(b_ref),
                               rtol=1e-4, atol=1e-3)


def test_fused_moments_padding_independence(rng):
    """K-padding with invalid (+inf bias) slots must not change H/b (the
    gated-pair damping depends only on real pairs, not pad slots)."""
    from svnicp_tpu.core import residuals  # noqa: F401 (parity w/ sibling test)

    p, b = 8, 64
    source = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 5)
    src_valid = jnp.asarray(rng.random(b) > 0.2)
    cand = jnp.asarray(rng.normal(size=(b, 128, 3)).astype(np.float32) * 5)
    cvalid = jnp.asarray(rng.random((b, 128)) > 0.1)
    xi = jnp.asarray(rng.normal(size=(p, 6)).astype(np.float32) * 0.1)
    r = geo.bso3_exp(xi[:, 3:])
    params = jnp.concatenate([r.reshape(p, 9), xi[:, :3]], axis=-1)
    max_dist = 2.8

    feat1, bias1 = svn.correspondence_features(source, cand, cvalid)
    h1, b1 = nn_pallas.fused_moments(
        params, feat1, bias1, cand, source, src_valid, max_dist,
        particle_tile=8, point_tile=16, interpret=True,
    )
    cand_p, cvalid_p = nn_pallas.pad_candidates(cand, cvalid, multiple=256)
    feat2, bias2 = svn.correspondence_features(source, cand_p, cvalid_p)
    h2, b2 = nn_pallas.fused_moments(
        params, feat2, bias2, cand_p, source, src_valid, max_dist,
        particle_tile=8, point_tile=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-5)


def test_bucketed_candidates_matches_oracle(rng):
    """Fused stage-1 kernel vs knn_candidates_bucketed + gather (the XLA
    oracle), incl. invalid targets/sources and nt % k != 0 padding."""
    from svnicp_tpu.kernels import knn

    b, nt, k = 64, 1000, 8   # group 125 -> lane-pad to 128 inside the kernel
    source = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 10)
    target = jnp.asarray(rng.normal(size=(nt, 3)).astype(np.float32) * 10)
    sv = jnp.asarray(rng.random(b) > 0.1)
    tv = jnp.asarray(rng.random(nt) > 0.2)

    idx, d2_ref = knn.knn_candidates_bucketed(source, target, sv, tv, k)
    pts_ref, valid_ref = knn.gather_candidates(target, idx, d2_ref)

    pts_ker, d2_ker = nn_pallas.bucketed_candidates(
        source, target, sv, tv, k, point_tile=16, interpret=True)
    valid_ker = np.isfinite(np.asarray(d2_ker))

    np.testing.assert_array_equal(valid_ker, np.asarray(valid_ref))
    mask = valid_ker
    np.testing.assert_allclose(np.asarray(d2_ker)[mask],
                               np.asarray(d2_ref)[mask], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pts_ker)[mask],
                               np.asarray(pts_ref)[mask], rtol=1e-4, atol=1e-4)


def test_fused_moments_plane_matches_xla_assembly(rng):
    """The fused point-to-plane kernel must reproduce the XLA plane H/b."""
    from svnicp_tpu.core import residuals

    p, b, k = 8, 64, 128
    source = jnp.asarray(rng.normal(size=(b, 3)).astype(np.float32) * 5)
    src_valid = jnp.asarray(rng.random(b) > 0.2)
    cand = jnp.asarray(rng.normal(size=(b, k, 3)).astype(np.float32) * 5)
    cvalid = jnp.asarray(rng.random((b, k)) > 0.1)
    feat, bias = svn.correspondence_features(source, cand, cvalid)
    normals, n_valid = residuals.plane_normals(cand, cvalid)
    xi = jnp.asarray(rng.normal(size=(p, 6)).astype(np.float32) * 0.1)
    r = geo.bso3_exp(xi[:, 3:])
    t = xi[:, :3]
    params = jnp.concatenate([r.reshape(p, 9), t], axis=-1)
    max_dist = 2.8

    h_ker, b_ker = nn_pallas.fused_moments_plane(
        params, feat, bias, cand, source, normals, n_valid & src_valid,
        max_dist, particle_tile=8, point_tile=16, interpret=True,
    )

    m_ref, s_ref = nn_pallas.fused_nn_match_oracle(params, feat, bias, cand)
    transformed = jnp.einsum("pij,bj->pbi", r, source) + t[:, None, :]
    nn_d2 = jnp.maximum(s_ref + jnp.sum(transformed**2, axis=-1), 0.0)
    pair_valid = (nn_d2 < max_dist) & jnp.isfinite(s_ref)
    h_ref, b_ref = residuals.ensemble_gauss_newton_plane(
        source, transformed, m_ref, normals,
        pair_valid & (n_valid & src_valid)[None, :], r, max_dist)
    np.testing.assert_allclose(np.asarray(h_ker), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b_ker), np.asarray(b_ref),
                               rtol=1e-4, atol=1e-3)


def test_align_plane_with_pallas_matches_xla(rng):
    """End-to-end point-to-plane: align with use_pallas (interpret) vs XLA.

    Tight parity is asserted at 10 iterations; past that the run sits at the
    Stein equilibrium where particles keep jiggling and the f32
    summation-order difference between the fused kernel and XLA amplifies
    chaotically (measured: 1e-7 mean diff at 10 iters, 6e-3 at 20 — both
    within 7 mm of the true transform). The long run asserts accuracy, not
    bit parity; per-kernel bit-level parity is guarded by the oracle tests
    above."""
    import dataclasses
    import os

    from svnicp_tpu.config import SteinICPConfig
    from jax.experimental.pallas import tpu as pltpu

    n = 256
    cloud = rng.normal(size=(n, 3)).astype(np.float32) * 5
    cloud[:80, 2] = 0.0
    cloud[80:160, 1] = 4.0
    xi = jnp.asarray([0.1, -0.05, 0.02, 0.01, 0.0, 0.02])
    r, t = geo.se3_exp(xi)
    target = geo.transform_points(r, t, jnp.asarray(cloud))
    cfg = SteinICPConfig(particle_count=4, iterations=10, knn_count=16,
                         max_dist=2.8, early_stop=False,
                         residual="point_to_plane")
    init = svn.init_particles_uniform(jax.random.PRNGKey(0), 4, cfg.init_lb, cfg.init_ub)
    args = (jnp.asarray(cloud), jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    cfg20 = dataclasses.replace(cfg, iterations=20)
    ref = svn.register(cfg, *args)
    ref20 = svn.register(cfg20, *args)
    os.environ["SVNICP_PALLAS_INTERPRET"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = svn.register(dataclasses.replace(cfg, use_pallas=True), *args)
            out20 = svn.register(dataclasses.replace(cfg20, use_pallas=True), *args)
    finally:
        del os.environ["SVNICP_PALLAS_INTERPRET"]
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean), atol=1e-4)
    for res in (ref20, out20):
        assert np.linalg.norm(np.asarray(res.mean[:3]) - np.asarray(t)) < 0.02
        assert np.linalg.norm(np.asarray(res.mean[3:]) - np.asarray(xi[3:])) < 0.02


def test_align_with_pallas_matches_xla(rng):
    """End-to-end: align with use_pallas (interpret) vs the XLA path."""
    import dataclasses

    from svnicp_tpu.config import SteinICPConfig
    from jax.experimental.pallas import tpu as pltpu

    n = 256
    cloud = rng.normal(size=(n, 3)).astype(np.float32) * 5
    cloud[:80, 2] = 0.0
    cloud[80:160, 1] = 4.0
    xi = jnp.asarray([0.1, -0.05, 0.02, 0.01, 0.0, 0.02])
    r, t = geo.se3_exp(xi)
    target = geo.transform_points(r, t, jnp.asarray(cloud))
    cfg = SteinICPConfig(particle_count=4, iterations=20, knn_count=16,
                         max_dist=2.8, early_stop=False)
    init = svn.init_particles_uniform(jax.random.PRNGKey(0), 4, cfg.init_lb, cfg.init_ub)
    args = (jnp.asarray(cloud), jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    ref = svn.register(cfg, *args)
    cfg_p = dataclasses.replace(cfg, use_pallas=True)
    import os

    os.environ["SVNICP_PALLAS_INTERPRET"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = svn.register(cfg_p, *args)
    finally:
        del os.environ["SVNICP_PALLAS_INTERPRET"]
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean), atol=1e-4)
