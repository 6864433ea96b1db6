"""IMU strapdown mechanization, pure jnp.

TPU-native replacement for the reference's GTSAM-based free functions
(ref: svn-icp/src/sensor/IMU.cpp:20-79 + include/sensor/IMU.h). The nav state
is a plain pytree so an entire IMU window can be integrated inside one jitted
`lax.scan` with per-sample validity masks (the reference loops per sample on
the host at callback rate).

Faithfully reproduced reference behaviors (flagged because they deviate from
textbook strapdown; parity with the reference trajectory requires them):
- the gravity increment added to *velocity* is rotated into the body-derived
  frame (`R * g * dt`, IMU.cpp:39) while the one added to *position* is not
  (:48-49);
- the attitude increment composes as Euler RzRyRx of (gyro*dt), not Expmap
  (IMU.cpp:51-53) — identical to 2nd order for small angles.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from svnicp_tpu.core import geometry as geo

# ref: svn-icp/include/sensor/IMU.h:24
GRAVITY = 9.782940329221166


class IMUSample(NamedTuple):
    """One IMU measurement; fields may carry a leading batch axis."""

    dt: jax.Array     # [] seconds since previous sample
    acc: jax.Array    # [3] linear acceleration (body)
    gyro: jax.Array   # [3] angular velocity (body)


class NavState(NamedTuple):
    """Pose + velocity (ref: gtsam::NavState in data/DataTypes.h:56-122)."""

    r: jax.Array      # [3,3] body-to-nav rotation
    t: jax.Array      # [3] position
    v: jax.Array      # [3] velocity

    @staticmethod
    def identity(dtype=jnp.float32) -> "NavState":
        return NavState(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype), jnp.zeros(3, dtype))


def compensate(sample: IMUSample, bias_acc: jax.Array, bias_gyro: jax.Array) -> IMUSample:
    """Subtract estimated biases (ref: IMUCompensation, IMU.cpp:60-63)."""
    return IMUSample(sample.dt, sample.acc - bias_acc, sample.gyro - bias_gyro)


def propagate(state: NavState, imu_start: IMUSample, imu_finish: IMUSample) -> NavState:
    """One strapdown step (ref: IMUPropagation, IMU.cpp:20-58)."""
    g = jnp.array([0.0, 0.0, -GRAVITY], state.t.dtype)
    d_vfb = imu_start.acc * imu_start.dt
    d_vfn = state.r @ d_vfb
    d_vgn = (state.r @ g) * imu_finish.dt          # reference quirk: rotated g
    vel = state.v + d_vfn + d_vgn
    dt = imu_finish.dt
    t_new = state.t + state.v * dt + 0.5 * g * dt * dt + 0.5 * d_vfn * dt
    rot_vec = imu_start.gyro * dt
    d_r = geo.euler_zyx_to_matrix(rot_vec[0], rot_vec[1], rot_vec[2])  # RzRyRx
    r_new = jnp.matmul(state.r, d_r, precision=jax.lax.Precision.HIGHEST)
    return NavState(r_new, t_new, vel)


def interpolate(
    lidar_offset: jax.Array,   # seconds from imu_pre to the LiDAR stamp
    imu_gap: jax.Array,        # seconds from imu_pre to imu_current
    imu_pre: IMUSample,
    imu_current: IMUSample,
) -> tuple[IMUSample, IMUSample, IMUSample]:
    """Linear interpolation of an IMU sample at the LiDAR timestamp.

    Returns (pre', mid, cur') with the reference's exact dt bookkeeping
    (ref: IMUInterpolation, IMU.cpp:65-79): pre'.dt = pre->lidar gap,
    cur'.dt = lidar->cur gap, and mid.dt = 0 (the reference leaves the
    interpolated sample's dt default-initialized, DataTypes.h:132 — so the
    straddling predict advances velocity over [pre, lidar] but not
    position/attitude; the follow-up predict advances attitude over
    [lidar, cur] with the interpolated gyro)."""
    ratio = lidar_offset / jnp.maximum(imu_gap, 1e-9)
    mid = IMUSample(
        dt=jnp.zeros_like(lidar_offset),
        acc=(1.0 - ratio) * imu_pre.acc + ratio * imu_current.acc,
        gyro=(1.0 - ratio) * imu_pre.gyro + ratio * imu_current.gyro,
    )
    pre = IMUSample(lidar_offset, imu_pre.acc, imu_pre.gyro)
    cur = IMUSample(imu_gap - lidar_offset, imu_current.acc, imu_current.gyro)
    return pre, mid, cur
