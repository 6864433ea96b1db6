"""Fused Stein-update kernel (kernels/stein_pallas.py) vs oracles.

Per the kernel convention (CLAUDE.md): interpret-mode runs against the
shared jnp body (identical trace -> exact), plus independent checks against
the pre-existing svn.py op path that the kernel replaces, and the bit-exact
bisection median against sort-and-index."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svnicp_tpu.core import residuals, svn
from svnicp_tpu.kernels import stein_pallas as sp


def _random_problem(rng, p=16):
    """A plausible ensemble state: SPD Hessians, small poses."""
    a = rng.normal(size=(p, 6, 6)).astype(np.float32)
    hess = a @ a.transpose(0, 2, 1) + 10.0 * np.eye(6, dtype=np.float32)
    b = rng.normal(size=(p, 6)).astype(np.float32)
    w = 0.1 * rng.normal(size=(p, 3)).astype(np.float32)
    from svnicp_tpu.core import geometry as geo

    r = np.asarray(geo.bso3_exp(jnp.asarray(w)))
    t = 0.5 * rng.normal(size=(p, 3)).astype(np.float32)
    return jnp.asarray(hess), jnp.asarray(b), jnp.asarray(r), jnp.asarray(t)


class TestMedianBisect:
    @pytest.mark.parametrize("n", [16, 100, 4096])
    def test_matches_sorted_lower_median(self, rng, n):
        sq = (rng.gamma(2.0, 1.0, n) ** 2).astype(np.float32)
        sq[: n // 10] = 0.0                      # zero diagonal entries
        got = sp.lower_median_bisect(jnp.asarray(sq))
        want = np.sort(sq)[(n - 1) // 2]
        assert float(got) == float(want)         # bit-exact

    def test_all_equal(self):
        sq = jnp.full((64,), 2.5, jnp.float32)
        assert float(sp.lower_median_bisect(sq)) == 2.5


class TestKernelVsOracle:
    def test_interpret_matches_body(self, rng):
        from svnicp_tpu.core import geometry as geo

        hess, b, r, t = _random_problem(rng)
        coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)
        ro, to, stein = sp.stein_body(hess, b, r, t, coords, max_dist=3.0)
        rk, tk, gn, md = sp.stein_update(hess, b, r, t, max_dist=3.0,
                                         interpret=True)
        np.testing.assert_allclose(rk, ro, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(tk, to, rtol=1e-6, atol=1e-6)
        want_gn = float(jnp.mean(jnp.linalg.norm(stein, axis=1)))
        want_md = float(jnp.linalg.norm(jnp.mean(stein, axis=0)))
        assert np.isclose(float(gn), want_gn, rtol=1e-6)
        assert np.isclose(float(md), want_md, rtol=1e-6)

    def test_body_matches_svn_op_path(self, rng):
        """The shared body must reproduce the svn.py ops it replaces
        (coords -> solve -> svgd_precond_grad -> clip -> pose update)."""
        from svnicp_tpu.core import geometry as geo

        hess, b, r, t = _random_problem(rng)
        coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)
        ro, to, stein = sp.stein_body(hess, b, r, t, coords, max_dist=3.0)
        newton = residuals.ensemble_solve(hess, b)
        h_mean = jnp.mean(hess, axis=0)
        want = svn.svgd_precond_grad(coords, coords, -newton, h_mean, None)
        want = svn.clip_step(want, 3.0)
        r_want, t_want = svn._pose_update(r, t, want)
        np.testing.assert_allclose(stein, want, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(ro, r_want, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(to, t_want, rtol=2e-5, atol=2e-6)

    def test_prior_path_matches_svn_op_path(self, rng):
        from svnicp_tpu import config as cfg_mod

        cfg = cfg_mod.SteinICPConfig(particle_count=16, prior_information=True)
        hess, b, r, t = _random_problem(rng)
        from svnicp_tpu.core import geometry as geo

        coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)
        hess_p, b_p = svn.add_prior_information(cfg, hess, b, coords)
        scale = svn.prior_kernel_scale(cfg, jnp.float32)
        newton = residuals.ensemble_solve(hess_p, b_p)
        h_mean = jnp.mean(hess_p, axis=0)
        want = svn.svgd_precond_grad(coords, coords, -newton, h_mean, scale)
        want = svn.clip_step(want, 3.0)

        prior_inv = svn.prior_inverse_variance(cfg, jnp.float32)
        _, _, stein = sp.stein_body(hess, b, r, t, coords, max_dist=3.0,
                                    prior_inv=prior_inv, prior_scale=scale)
        np.testing.assert_allclose(stein, want, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("p", [10, 30])
    def test_padded_matches_unpadded(self, rng, p):
        """The sublane-padded ensemble (true_p masking) must reproduce the
        unpadded update exactly: geode P=10 / subt P=30 are the reference's
        own operating points (config/geodeAlpha.yaml:6, subt-mrs.yaml:5)."""
        from svnicp_tpu.core import geometry as geo

        hess, b, r, t = _random_problem(rng, p=p)
        coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)
        ro, to, stein = sp.stein_body(hess, b, r, t, coords, max_dist=3.0)

        pad = (-p) % 8
        hess_p = jnp.concatenate(
            [hess, jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32)[None], (pad, 6, 6))])
        b_p = jnp.concatenate([b, jnp.zeros((pad, 6), jnp.float32)])
        r_p = jnp.concatenate(
            [r, jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None], (pad, 3, 3))])
        t_p = jnp.concatenate([t, jnp.zeros((pad, 3), jnp.float32)])
        rk, tk, gn, md = sp.stein_update(hess_p, b_p, r_p, t_p, max_dist=3.0,
                                         true_p=p, interpret=True)
        np.testing.assert_allclose(rk[:p], ro, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(tk[:p], to, rtol=1e-6, atol=1e-6)
        # pad rows must come back untouched (identity update)
        np.testing.assert_allclose(rk[p:], r_p[p:], rtol=0, atol=0)
        np.testing.assert_allclose(tk[p:], t_p[p:], rtol=0, atol=0)
        want_gn = float(jnp.mean(jnp.linalg.norm(stein, axis=1)))
        want_md = float(jnp.linalg.norm(jnp.mean(stein, axis=0)))
        assert np.isclose(float(gn), want_gn, rtol=1e-5)
        assert np.isclose(float(md), want_md, rtol=1e-5)

    def test_padded_prior_matches_unpadded(self, rng):
        from svnicp_tpu.core import geometry as geo

        p, pad = 10, 6
        hess, b, r, t = _random_problem(rng, p=p)
        coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)
        prior = jnp.stack([jnp.full((6,), 3.0), jnp.full((6,), 0.5)])
        ro, to, _ = sp.stein_body(hess, b, r, t, coords, max_dist=3.0,
                                  prior_inv=prior[0], prior_scale=prior[1])
        hess_p = jnp.concatenate(
            [hess, jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32)[None], (pad, 6, 6))])
        b_p = jnp.concatenate([b, jnp.zeros((pad, 6), jnp.float32)])
        r_p = jnp.concatenate(
            [r, jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None], (pad, 3, 3))])
        t_p = jnp.concatenate([t, jnp.zeros((pad, 3), jnp.float32)])
        rk, tk, _, _ = sp.stein_update(hess_p, b_p, r_p, t_p, prior,
                                       max_dist=3.0, use_prior=True,
                                       true_p=p, interpret=True)
        np.testing.assert_allclose(rk[:p], ro, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(tk[:p], to, rtol=1e-6, atol=1e-6)

    def test_interpret_prior_flag(self, rng):
        from svnicp_tpu.core import geometry as geo

        hess, b, r, t = _random_problem(rng)
        coords = jnp.concatenate([t, geo.bso3_log(r)], axis=-1)
        prior = jnp.stack([jnp.full((6,), 3.0), jnp.full((6,), 0.5)])
        ro, to, _ = sp.stein_body(hess, b, r, t, coords, max_dist=3.0,
                                  prior_inv=prior[0], prior_scale=prior[1])
        rk, tk, _, _ = sp.stein_update(hess, b, r, t, prior, max_dist=3.0,
                                       use_prior=True, interpret=True)
        np.testing.assert_allclose(rk, ro, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(tk, to, rtol=1e-6, atol=1e-6)
