"""Multi-device tests on the CPU-simulated 8-device mesh (SURVEY.md §4.4):
the sharded align must agree with the single-device reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo, svn
from svnicp_tpu.parallel import sharding


def make_problem(rng, n=768):
    n3 = n // 3
    floor = np.stack([rng.uniform(-10, 10, n3), rng.uniform(-10, 10, n3), np.zeros(n3)], 1)
    wall1 = np.stack([rng.uniform(-10, 10, n3), np.full(n3, 8.0), rng.uniform(0, 4, n3)], 1)
    wall2 = np.stack([np.full(n - 2 * n3, -6.0), rng.uniform(-10, 10, n - 2 * n3),
                      rng.uniform(0, 4, n - 2 * n3)], 1)
    cloud = np.concatenate([floor, wall1, wall2]).astype(np.float32)
    cloud += rng.normal(scale=0.01, size=cloud.shape).astype(np.float32)
    xi = jnp.asarray([0.25, -0.15, 0.08, 0.02, -0.02, 0.04], jnp.float32)
    r, t = geo.se3_exp(xi)
    target = geo.transform_points(r, t, jnp.asarray(cloud))
    return jnp.asarray(cloud), target, (r, t)


# 12 iterations: mid-convergence, where numeric parity is meaningful. At the
# Stein equilibrium (>=~20 iters with early_stop off) particles keep jiggling
# and the f32 reduction-order difference between psum and the single-device
# sum amplifies chaotically (see test_equilibrium_accuracy below, and the
# same structure in test_nn_pallas.test_align_plane_with_pallas_matches_xla).
CFG = SteinICPConfig(particle_count=8, iterations=12, lr=1.0, max_dist=2.8,
                     knn_count=16, early_stop=False)


@pytest.mark.parametrize("axes", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_sharded_matches_single_device(rng, axes, devices):
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    source, target, _ = make_problem(rng)
    n = source.shape[0]
    init = svn.init_particles_uniform(jax.random.PRNGKey(0), CFG.particle_count,
                                      CFG.init_lb, CFG.init_ub)
    args = (source, jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    ref = svn.register(CFG, *args)
    mesh = sharding.make_mesh(*axes)
    out = sharding.sharded_register(mesh, CFG, *args)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.var), np.asarray(ref.var),
                               rtol=0.05, atol=1e-6)
    assert int(out.iterations) == int(ref.iterations)


def test_equilibrium_accuracy(rng, devices):
    """Long (equilibrium) sharded run: bit parity is no longer meaningful,
    but both paths must recover the true transform to millimetres."""
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    import dataclasses

    source, target, (r_true, t_true) = make_problem(rng)
    cfg = dataclasses.replace(CFG, iterations=40)
    n = source.shape[0]
    init = svn.init_particles_uniform(jax.random.PRNGKey(0), cfg.particle_count,
                                      cfg.init_lb, cfg.init_ub)
    args = (source, jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    ref = svn.register(cfg, *args)
    out = sharding.sharded_register(sharding.make_mesh(2, 4), cfg, *args)
    for res in (ref, out):
        assert np.linalg.norm(np.asarray(res.mean[:3]) - np.asarray(t_true)) < 0.02
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean),
                               atol=2e-3)


def test_sharded_svn_full_grad(rng, devices):
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    source, target, _ = make_problem(rng)
    cfg = SteinICPConfig(particle_count=8, iterations=30, lr=1.0, max_dist=2.8,
                         knn_count=16, early_stop=False, svn_full_grad=True)
    n = source.shape[0]
    init = svn.init_particles_uniform(jax.random.PRNGKey(1), 8, cfg.init_lb, cfg.init_ub)
    args = (source, jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    ref = svn.register(cfg, *args)
    mesh = sharding.make_mesh(2, 4)
    out = sharding.sharded_register(mesh, cfg, *args)
    # the kernel-Hessian inverse amplifies fp reduction-order differences
    # over 30 coupled iterations; a few 1e-3 agreement is the expected
    # envelope (any fusion-boundary change in XLA shifts reduction order
    # and moves this by ~1e-3 — observed when the step-clip op was added)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean), atol=8e-3)


def test_sharded_point_to_plane_matches_single_device(rng, devices):
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    source, target, _ = make_problem(rng)
    cfg = SteinICPConfig(particle_count=8, iterations=30, lr=1.0, max_dist=2.8,
                         knn_count=16, early_stop=True,
                         residual="point_to_plane",
                         convergence_metric="mean_delta",
                         convergence_threshold=1e-4)
    n = source.shape[0]
    init = svn.init_particles_uniform(jax.random.PRNGKey(2), 8, cfg.init_lb, cfg.init_ub)
    args = (source, jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    ref = svn.register(cfg, *args)
    mesh = sharding.make_mesh(2, 4)
    out = sharding.sharded_register(mesh, cfg, *args)
    # psum reduction order differs from the single-device sum; the softer
    # plane H amplifies it over the coupled iterations (same envelope as the
    # full-grad test above)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean), atol=2e-3)
    # same early-stop iteration on every shard and as the reference
    assert int(out.iterations) == int(ref.iterations)


def test_auto_axes():
    assert sharding.auto_axes(8, 64) == (8, 1)
    assert sharding.auto_axes(8, 4) == (4, 2)
    assert sharding.auto_axes(8, 1) == (1, 8)
    assert sharding.auto_axes(4, 64) == (4, 1)
    assert sharding.auto_axes(1, 64) == (1, 1)


def test_sharded_with_pallas_matches_xla(rng, devices):
    """use_pallas inside shard_map: the per-shard fused kb kernels must
    reproduce the sharded XLA path. Runs only on a real TPU backend —
    interpret-mode Pallas inside shard_map is pathologically slow on the
    simulated CPU mesh (validated there by the single-device
    test_align_plane_with_pallas_matches_xla instead)."""
    import dataclasses

    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU backend (interpret+shard_map too slow)")
    source, target, _ = make_problem(rng, n=1024)   # 128-multiple shards
    cfg = dataclasses.replace(CFG, iterations=10, residual="point_to_plane",
                              convergence_metric="mean_delta")
    n = source.shape[0]
    init = svn.init_particles_uniform(jax.random.PRNGKey(2), cfg.particle_count,
                                      cfg.init_lb, cfg.init_ub)
    args = (source, jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    n_dev = len(jax.devices())
    mesh = sharding.make_mesh(*sharding.auto_axes(n_dev, cfg.particle_count))
    ref = sharding.sharded_register(mesh, cfg, *args)
    out = sharding.sharded_register(
        mesh, dataclasses.replace(cfg, use_pallas=True), *args)
    # f32 argmin near-ties flip between the kernel and XLA paths and the
    # difference compounds over iterations; mm-level agreement is the
    # realistic contract (measured 1.7e-3 max at 15 iterations on v5e)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(ref.mean),
                               atol=5e-3)


def test_sharded_history_matches_single_device(rng, devices):
    """Sharded save_particles (round 5): the [iters,P,6] per-iteration
    particle stack from the mesh run must match svn.align_with_history —
    the history contract holds under sharding (ref: /svnicp/all_particles,
    OdometryPipeline.cpp:966-985)."""
    if len(devices) < 8:
        pytest.skip("needs 8 devices")
    source, target, _ = make_problem(rng)
    n = source.shape[0]
    init = svn.init_particles_uniform(jax.random.PRNGKey(0), CFG.particle_count,
                                      CFG.init_lb, CFG.init_ub)
    args = (source, jnp.ones(n, bool), target, jnp.ones(n, bool),
            jnp.eye(3), jnp.zeros(3), init)
    ref, ref_hist = svn.register_with_history(CFG, *args)
    mesh = sharding.make_mesh(2, 4)
    out, hist = sharding.sharded_register(mesh, CFG, *args, history=True)
    assert hist.shape == (CFG.iterations, CFG.particle_count, 6)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ref_hist),
                               atol=5e-4)
    # the last history row is the final particle set
    np.testing.assert_allclose(np.asarray(hist[-1]),
                               np.asarray(out.particles), atol=1e-6)
