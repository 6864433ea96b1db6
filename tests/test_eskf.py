"""IMU mechanization + ESKF tests against numpy transcriptions of the
reference equations (ESEKF.cpp, IMU.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from svnicp_tpu.config import IMUNoiseConfig, LIOConfig
from svnicp_tpu.core import eskf, geometry as geo, imu


def still_sample(dt=0.01):
    # IMU at rest measures +G on z (so propagation cancels gravity exactly)
    return imu.IMUSample(jnp.asarray(dt), jnp.asarray([0.0, 0.0, imu.GRAVITY]), jnp.zeros(3))


def make_noise():
    return IMUNoiseConfig.from_yaml_units([2.0, 2.0, 10.0], [50.0] * 3, [20.0] * 3, [500.0] * 3)


class TestIMU:
    def test_stationary_propagation(self):
        state = imu.NavState.identity()
        s = still_sample()
        for _ in range(100):
            state = imu.propagate(state, s, s)
        np.testing.assert_allclose(np.asarray(state.v), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.t), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state.r), np.eye(3), atol=1e-6)

    def test_constant_rotation(self):
        state = imu.NavState.identity()
        w = np.array([0.0, 0.0, 0.5])  # yaw rate
        s = imu.IMUSample(jnp.asarray(0.01), jnp.asarray([0.0, 0.0, imu.GRAVITY]), jnp.asarray(w))
        for _ in range(100):
            state = imu.propagate(state, s, s)
        # after 1s at 0.5 rad/s -> yaw = 0.5
        yaw = np.arctan2(np.asarray(state.r)[1, 0], np.asarray(state.r)[0, 0])
        np.testing.assert_allclose(yaw, 0.5, atol=5e-3)

    def test_constant_acceleration(self):
        state = imu.NavState.identity()
        acc = jnp.asarray([1.0, 0.0, imu.GRAVITY])
        s = imu.IMUSample(jnp.asarray(0.01), acc, jnp.zeros(3))
        for _ in range(100):
            state = imu.propagate(state, s, s)
        np.testing.assert_allclose(np.asarray(state.v), [1.0, 0, 0], atol=1e-4)
        # x ≈ 0.5 a t^2 (discretization: first-order hold)
        assert 0.45 < float(state.t[0]) < 0.56

    def test_compensation(self):
        s = imu.IMUSample(jnp.asarray(0.01), jnp.ones(3), jnp.ones(3))
        out = imu.compensate(s, jnp.asarray([0.1] * 3), jnp.asarray([0.2] * 3))
        np.testing.assert_allclose(np.asarray(out.acc), 0.9, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.gyro), 0.8, atol=1e-6)

    def test_interpolation_bookkeeping(self):
        pre = imu.IMUSample(jnp.asarray(0.01), jnp.zeros(3), jnp.zeros(3))
        cur = imu.IMUSample(jnp.asarray(0.01), jnp.ones(3), jnp.asarray([2.0] * 3))
        pre2, mid, cur2 = imu.interpolate(jnp.asarray(0.003), jnp.asarray(0.01), pre, cur)
        np.testing.assert_allclose(float(pre2.dt), 0.003)
        np.testing.assert_allclose(float(cur2.dt), 0.007, atol=1e-9)
        np.testing.assert_allclose(float(mid.dt), 0.0)
        np.testing.assert_allclose(np.asarray(mid.acc), 0.3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mid.gyro), 0.6, atol=1e-6)


class TestESKF:
    def setup_method(self, _):
        self.noise = make_noise()
        self.lio = LIOConfig()

    def test_predict_grows_covariance(self):
        st = eskf.create(self.lio, self.noise)
        s = still_sample()
        tr0 = float(jnp.trace(st.cov))
        for _ in range(50):
            st = eskf.predict(st, s, s, self.noise)
        assert float(jnp.trace(st.cov)) > tr0
        assert np.isfinite(np.asarray(st.cov)).all()

    def test_update_shrinks_covariance_and_injects(self):
        st = eskf.create(self.lio, self.noise)
        s = still_sample()
        for _ in range(10):
            st = eskf.predict(st, s, s, self.noise)
        pos_var0 = float(st.cov[0, 0])
        correction = jnp.asarray([0.1, -0.05, 0.02, 0.0, 0.0, 0.01])
        r_icp = jnp.eye(6) * 1e-4
        st2 = eskf.update(st, r_icp, correction)
        assert float(st2.cov[0, 0]) < pos_var0
        # strong measurement, weak prior in rotation part: injection moves pose
        assert abs(float(st2.nav.t[0]) - 0.1) < 0.05
        assert np.isfinite(np.asarray(st2.gain)).all()

    def test_update_matches_numpy_kalman(self, rng):
        st = eskf.create(self.lio, self.noise)
        s = still_sample()
        for _ in range(5):
            st = eskf.predict(st, s, s, self.noise)
        cov = np.asarray(st.cov, np.float64)
        h = np.zeros((6, 15))
        h[0:3, 0:3] = np.eye(3)
        h[3:6, 6:9] = np.eye(3)
        r_icp = np.diag(rng.uniform(1e-4, 1e-3, 6))
        z = rng.normal(size=6) * 0.01
        gain = cov @ h.T @ np.linalg.inv(h @ cov @ h.T + r_icp)
        delta = gain @ z
        cov_post = cov - gain @ h @ cov
        st2 = eskf.update(st, jnp.asarray(r_icp, jnp.float32), jnp.asarray(z, jnp.float32))
        np.testing.assert_allclose(np.asarray(st2.cov), cov_post, rtol=2e-2, atol=1e-7)
        np.testing.assert_allclose(np.asarray(st2.nav.t), delta[0:3], rtol=2e-2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st2.bg), delta[9:12], rtol=2e-2, atol=1e-7)
        np.testing.assert_allclose(np.asarray(st2.ba), delta[12:15], rtol=2e-2, atol=1e-7)

    def test_filter_converges_on_static_scene(self):
        st = eskf.create(self.lio, self.noise)
        s = still_sample()
        key = jax.random.PRNGKey(0)
        for i in range(40):
            for _ in range(10):
                st = eskf.predict(st, s, s, self.noise)
            key, sub = jax.random.split(key)
            # ICP observes "pose error = -current pose" (true pose = identity)
            obs_t = -st.nav.t + 0.001 * jax.random.normal(sub, (3,))
            obs_w = -geo.so3_log(st.nav.r)
            z = jnp.concatenate([st.nav.r.T @ obs_t, obs_w])
            st = eskf.update(st, jnp.eye(6) * 1e-4, z)
        assert float(jnp.linalg.norm(st.nav.t)) < 0.02
        assert float(st.cov[0, 0]) < self.lio.init_pos_std[0] ** 2

    def test_random_walk_variance_echo(self):
        st = eskf.create(self.lio, self.noise)
        s = still_sample()
        st = eskf.predict(st, s, s, self.noise)
        rw = np.asarray(eskf.random_walk_variance(st))
        assert rw.shape == (6,)
        assert (rw > 0).all()
