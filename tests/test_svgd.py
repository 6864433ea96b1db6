"""SVGD-ICP variant tests: optimizer factory, transform recovery per
optimizer, minibatch mode, Euler-coordinate outputs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnicp_tpu.config import SteinICPConfig
from svnicp_tpu.core import geometry as geo, svgd
from test_svn import make_structured_cloud

CFG = SteinICPConfig(method="svgd", particle_count=16, iterations=120, lr=0.03,
                     max_dist=1.0, knn_count=32, early_stop=True,
                     convergence_threshold=1e-5, optimizer="adam")


def recover(cfg, cloud, true_xi, seed=0):
    r_true, t_true = geo.se3_exp(jnp.asarray(true_xi, jnp.float32))
    target = geo.transform_points(r_true, t_true, jnp.asarray(cloud))
    key = jax.random.PRNGKey(seed)
    from svnicp_tpu.core import svn

    init = svn.init_particles_uniform(key, cfg.particle_count, cfg.init_lb, cfg.init_ub)
    res = svgd.register(cfg, jnp.asarray(cloud), jnp.ones(len(cloud), bool),
                        target, jnp.ones(len(target), bool),
                        jnp.eye(3), jnp.zeros(3), init, rng=key)
    # mean is in Euler coords [x,y,z,r,p,y]; compose with identity guess
    rc = geo.euler_zyx_to_matrix(res.mean[3], res.mean[4], res.mean[5])
    tc = res.mean[:3]
    return res, np.asarray(rc), np.asarray(tc), np.asarray(r_true), np.asarray(t_true)


def test_optimizer_factory():
    for name in ["adam", "rmsprop", "sgd", "adagrad"]:
        opt = svgd.make_optimizer(name, 0.01)
        state = opt.init(jnp.zeros((4, 6)))
        updates, _ = opt.update(jnp.ones((4, 6)), state, jnp.zeros((4, 6)))
        assert np.isfinite(np.asarray(updates)).all()
    with pytest.raises(ValueError):
        svgd.make_optimizer("lbfgs", 0.01)


def test_adam_recovers_small_transform(rng):
    cloud = make_structured_cloud(rng, n=600)
    true_xi = np.array([0.08, -0.05, 0.03, 0.01, -0.01, 0.02])
    res, rc, tc, r_true, t_true = recover(CFG, cloud, true_xi)
    assert np.linalg.norm(tc - t_true) < 0.04
    assert np.linalg.norm(rc - r_true) < 0.02


def test_minibatch_mode_runs_and_recovers(rng):
    cloud = make_structured_cloud(rng, n=600)
    cfg = dataclasses.replace(CFG, use_minibatch=True, batch_size=128, iterations=150)
    true_xi = np.array([0.06, -0.04, 0.02, 0.0, 0.01, -0.01])
    res, rc, tc, r_true, t_true = recover(cfg, cloud, true_xi)
    assert np.linalg.norm(tc - t_true) < 0.06


def test_single_particle_plain_descent(rng):
    cloud = make_structured_cloud(rng, n=400)
    cfg = dataclasses.replace(CFG, particle_count=1, iterations=200)
    true_xi = np.array([0.05, -0.03, 0.02, 0.005, 0.0, 0.01])
    res, rc, tc, r_true, t_true = recover(cfg, cloud, true_xi)
    assert np.linalg.norm(tc - t_true) < 0.05


@pytest.mark.parametrize("p", [8, 10])
def test_fused_nn_kernel_path_matches_xla(rng, monkeypatch, p):
    """The SVGD fused-1-NN path (use_pallas on TPU) must reproduce the XLA
    path's trajectory: force the kernel gate open on CPU and run the Pallas
    kernel in interpret mode, then compare full align() results."""
    import functools

    from svnicp_tpu.core import svn as svn_mod
    from svnicp_tpu.kernels import nn_pallas

    cloud = make_structured_cloud(rng, n=256)     # B = 256 (kernel tile)
    # p=10: non-sublane-multiple ensembles (the reference's own generic
    # SVGD point is P=30, ICP_parameters.yaml:5) exercise the pad-and-slice
    # path (svgd.align p8 padding)
    cfg = dataclasses.replace(CFG, particle_count=p, iterations=25,
                              knn_count=16, use_pallas=True)
    true_xi = np.array([0.06, -0.04, 0.02, 0.006, 0.0, 0.012])
    r_true, t_true = geo.se3_exp(jnp.asarray(true_xi, jnp.float32))
    target = geo.transform_points(r_true, t_true, jnp.asarray(cloud))
    from svnicp_tpu.core import svn

    init = svn.init_particles_uniform(jax.random.PRNGKey(1), p,
                                      cfg.init_lb, cfg.init_ub)
    args = (jnp.asarray(cloud), jnp.ones(len(cloud), bool),
            target, jnp.ones(len(target), bool),
            jnp.eye(3), jnp.zeros(3), init)

    res_xla = svgd.register(dataclasses.replace(cfg, use_pallas=False), *args)

    monkeypatch.setattr(svn_mod, "_pallas_ok", lambda: True)
    monkeypatch.setattr(
        nn_pallas, "fused_nn_match",
        functools.partial(nn_pallas.fused_nn_match.__wrapped__,
                          interpret=True))
    res_k = svgd.register(cfg, *args)

    assert int(res_k.iterations) == int(res_xla.iterations)
    np.testing.assert_allclose(np.asarray(res_k.mean),
                               np.asarray(res_xla.mean), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(res_k.particles),
                               np.asarray(res_xla.particles),
                               rtol=2e-3, atol=2e-4)
