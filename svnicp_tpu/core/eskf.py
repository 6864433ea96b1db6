"""15-state error-state Kalman filter, pure jnp.

TPU-native replacement for the reference's Eigen/GTSAM ESKF
(ref: svn-icp/src/estimator/ESEKF.cpp). Error state ordering
[dp(0:3), dv(3:6), dtheta(6:9), dbg(9:12), dba(12:15)] (ESEKF.cpp:41).

Reference-parity notes:
- the velocity->attitude coupling block of the state transition is
  `Rodrigues(R @ acc) * dt` — an exp of the rotated specific force used as a
  rotation matrix (ESEKF.cpp:47-48). Textbook ESKF would use -skew(R@acc)*dt.
  We reproduce the reference term by default (`textbook_phi=False`) so
  covariances match; the corrected variant is available for new deployments.
- the reference's bias injection indexes the correction vector off by one
  (gyro bias reads rows 10..12, accel bias rows 13..15 — out of bounds —
  ESEKF.cpp:94-95). That is a bug, not behavior worth keeping: we inject at
  the declared offsets 9:12 / 12:15.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svnicp_tpu.config import IMUNoiseConfig, LIOConfig
from svnicp_tpu.core import geometry as geo
from svnicp_tpu.core import imu as imu_mod


class ESKFState(NamedTuple):
    nav: imu_mod.NavState
    bg: jax.Array              # [3] gyro bias
    ba: jax.Array              # [3] accel bias
    cov: jax.Array             # [15,15]
    process_noise: jax.Array   # [15,15] last Q (for random-walk variance echo)
    gain: jax.Array            # [15,6] last Kalman gain (debug observability)


def create(lio: LIOConfig, noise: IMUNoiseConfig, dtype=jnp.float32) -> ESKFState:
    """Initial covariance from configured stds (ref: ESEKF.cpp:23-28).
    Attitude std is given in degrees in the configs."""
    d2r = jnp.pi / 180.0
    diag = jnp.concatenate(
        [
            jnp.asarray(lio.init_pos_std, dtype) ** 2,
            jnp.asarray(lio.init_vel_std, dtype) ** 2,
            (jnp.asarray(lio.init_rot_std, dtype) * d2r) ** 2,
            jnp.asarray(noise.bg_std, dtype) ** 2,
            jnp.asarray(noise.ba_std, dtype) ** 2,
        ]
    )
    return ESKFState(
        nav=imu_mod.NavState.identity(dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        cov=jnp.diag(diag),
        process_noise=jnp.zeros((15, 15), dtype),
        gain=jnp.zeros((15, 6), dtype),
    )


def predict(
    state: ESKFState,
    imu_prev: imu_mod.IMUSample,
    imu_cur: imu_mod.IMUSample,
    noise: IMUNoiseConfig,
    textbook_phi: bool = False,
) -> ESKFState:
    """Propagate nav state + covariance over one IMU interval
    (ref: ESEKF.cpp:34-69). `imu_cur` is bias-compensated here, as in the
    reference (IMUCompensation inside predict)."""
    dtype = state.cov.dtype
    imu_cur = imu_mod.compensate(imu_cur, state.ba, state.bg)
    nav_prev = state.nav
    nav = imu_mod.propagate(nav_prev, imu_prev, imu_cur)

    dt = imu_cur.dt
    r_prev = nav_prev.r
    eye3 = jnp.eye(3, dtype=dtype)
    phi = jnp.eye(15, dtype=dtype)
    phi = phi.at[0:3, 3:6].set(eye3 * dt)
    if textbook_phi:
        va = -geo.skew(r_prev @ imu_cur.acc) * dt
    else:
        va = geo.so3_exp(r_prev @ imu_cur.acc) * dt      # reference term
    phi = phi.at[3:6, 6:9].set(va)
    phi = phi.at[3:6, 12:15].set(r_prev * dt)
    phi = phi.at[6:9, 9:12].set(-r_prev * dt)

    def rot_diag(std):
        d = jnp.diag(jnp.asarray(std, dtype) ** 2)
        return r_prev @ d @ r_prev.T * dt

    q = jnp.zeros((15, 15), dtype)
    q = q.at[3:6, 3:6].set(rot_diag(noise.vel_rw))
    q = q.at[6:9, 6:9].set(rot_diag(noise.rot_rw))
    q = q.at[9:12, 9:12].set(2.0 * jnp.diag(jnp.asarray(noise.bg_std, dtype) ** 2) * dt)
    q = q.at[12:15, 12:15].set(2.0 * jnp.diag(jnp.asarray(noise.ba_std, dtype) ** 2) * dt)

    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    cov = mm(mm(phi, state.cov), phi.T) + q
    return state._replace(nav=nav, cov=cov, process_noise=q)


def update(
    state: ESKFState,
    icp_cov: jax.Array,        # [6,6] measurement covariance (dp, dtheta)
    icp_correction: jax.Array, # [6] observed correction [t, log R]
) -> ESKFState:
    """Fuse the ICP pose observation (ref: ESEKF.cpp:71-99).

    H selects dp and dtheta rows. Pose injection composes T * exp(error),
    velocity adds R_new @ dv; biases inject at their declared offsets
    (fixing the reference's off-by-one, see module docstring).
    """
    dtype = state.cov.dtype
    h = jnp.zeros((6, 15), dtype)
    h = h.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    h = h.at[3:6, 6:9].set(jnp.eye(3, dtype=dtype))

    mm = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    s = mm(mm(h, state.cov), h.T) + icp_cov
    gain = mm(mm(state.cov, h.T), jnp.linalg.inv(s))          # [15,6]
    delta = gain @ icp_correction                             # [15]
    cov = state.cov - mm(mm(gain, h), state.cov)

    t_err = delta[0:3]
    phi_err = delta[6:9]
    r_err = geo.so3_exp(phi_err)
    nav = state.nav
    r_new, t_new = geo.transform_compose(nav.r, nav.t, r_err, t_err)
    v_new = nav.v + r_new @ delta[3:6]
    bg = state.bg + delta[9:12]
    ba = state.ba + delta[12:15]
    return state._replace(
        nav=imu_mod.NavState(r_new, t_new, v_new), bg=bg, ba=ba, cov=cov, gain=gain
    )


def random_walk_variance(state: ESKFState) -> jax.Array:
    """Diag of the velocity/attitude process noise blocks
    (ref: ESKF.h:42-45 get_random_walk_variance)."""
    q = state.process_noise
    return jnp.concatenate([jnp.diagonal(q[3:6, 3:6]), jnp.diagonal(q[6:9, 6:9])])
