"""Batched SO(3)/SE(3) Lie-group operations, pure jnp and vmap-friendly.

TPU-native replacement for the reference's per-particle Lie math scattered
across libtorch tensor code and GTSAM calls:

- axis-angle exp + left Jacobian     (ref: svn-icp/src/core/SVNICP.cpp:166-194)
- SO(3) log                          (ref: svn-icp/src/core/SVNICP.cpp:196-215)
- Euler (ZYX) rotation build         (ref: svn-icp/src/core/SVGDICP.cpp:226-260)
- Euler partial derivatives          (ref: svn-icp/src/core/SVGDICP.cpp:335-396)
- SE(3) exp/log (gtsam Pose3::Expmap/Logmap equivalents used for constant-
  velocity prediction and deskewing, ref: OdometryPipeline.cpp:432, 706-737)

All functions operate on unbatched inputs ([3], [3,3], ...) and are written to
be `jax.vmap`-composable; the `b*` aliases are pre-vmapped over a leading
particle/point axis. Trig-singularities are handled with the `where`-trick so
both values and gradients are finite at the identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 3x3 products are tiny; always run them at full f32 precision on the MXU.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

_SMALL = 1e-6


def skew(v: jax.Array) -> jax.Array:
    """[...,3] -> [...,3,3] cross-product (hat) matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def unskew(m: jax.Array) -> jax.Array:
    """[...,3,3] -> [...,3], inverse of `skew` (vee operator)."""
    return jnp.stack(
        [m[..., 2, 1] - m[..., 1, 2], m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] - m[..., 0, 1]],
        axis=-1,
    ) * 0.5


def _taylor_coeffs_sq(a2: jax.Array):
    """Return (sin a / a, (1-cos a)/a^2, (a-sin a)/a^3) from a^2.

    Taking the *squared* angle keeps gradients finite at a=0: the sqrt only
    runs on the guarded branch, so no NaN leaks through `jnp.where`.
    """
    small = a2 < _SMALL
    a_safe = jnp.sqrt(jnp.where(small, 1.0, a2))
    sinc = jnp.where(small, 1.0 - a2 / 6.0, jnp.sin(a_safe) / a_safe)
    cosc = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(a_safe)) / (a_safe * a_safe))
    sinc3 = jnp.where(
        small, 1.0 / 6.0 - a2 / 120.0, (a_safe - jnp.sin(a_safe)) / (a_safe * a_safe * a_safe)
    )
    return sinc, cosc, sinc3


def _taylor_coeffs(angle: jax.Array):
    return _taylor_coeffs_sq(angle * angle)


def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle [3] -> rotation matrix [3,3] (Rodrigues).

    Matches the reference's `to_rotation_tensor` axis-angle branch
    (svn-icp/src/core/SVNICP.cpp:166-194) without the explicit axis
    normalization: R = I + sinc(a)*ŵ + cosc(a)*ŵ².
    """
    sinc, cosc, _ = _taylor_coeffs_sq(jnp.sum(w * w, axis=-1))
    W = skew(w)
    W2 = _mm(W, W)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + sinc[..., None, None] * W + cosc[..., None, None] * W2


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3) at axis-angle w [3] -> [3,3].

    J_l = I + cosc(a)*ŵ + sinc3(a)*ŵ²  (ref: SVNICP.cpp:188-192).
    """
    _, cosc, sinc3 = _taylor_coeffs_sq(jnp.sum(w * w, axis=-1))
    W = skew(w)
    W2 = _mm(W, W)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + cosc[..., None, None] * W + sinc3[..., None, None] * W2


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3) at w [3] -> [3,3]."""
    a2 = jnp.sum(w * w, axis=-1)
    small = a2 < _SMALL
    a_safe = jnp.sqrt(jnp.where(small, 1.0, a2))
    # coefficient of W^2: (1/a^2) - (1+cos a)/(2 a sin a), Taylor: 1/12 + a^2/720
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + a2 / 720.0,
        1.0 / (a_safe * a_safe)
        - (1.0 + jnp.cos(a_safe)) / (2.0 * a_safe * jnp.sin(a_safe)),
    )
    W = skew(w)
    W2 = _mm(W, W)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix [3,3] -> axis-angle [3].

    Same trace-based formula as the reference (SVNICP.cpp:196-215): zeros the
    output when sin(angle) ~ 0 at angle ~ pi (a measure-zero case the
    reference also leaves degenerate); exact Taylor branch at the identity.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_a = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    vee = unskew(R)  # = sin(angle) * axis
    s2 = jnp.sum(vee * vee, axis=-1)  # = sin(angle)^2
    small = s2 < 1e-12
    near_pi = small & (cos_a < 0.0)
    # gradient-safe: angle from atan2(sin, cos); no arccos (its derivative
    # blows up at the identity and poisons jacfwd through the Taylor branch)
    sin_a = jnp.sqrt(jnp.where(small, 1.0, s2))
    angle = jnp.arctan2(sin_a, cos_a)
    # angle/sin(angle); near identity use the c-based Taylor
    # theta^2 ~ 2(1-c) => theta/sin(theta) ~ 1 + (1-c)/3
    factor = jnp.where(small, 1.0 + (1.0 - cos_a) / 3.0, angle / sin_a)
    w = factor[..., None] * vee
    return jnp.where(near_pi[..., None], jnp.zeros_like(w), w)


def se3_exp(xi: jax.Array) -> tuple[jax.Array, jax.Array]:
    """se(3) tangent [6] = [rho(3), omega(3)] -> (R [3,3], t [3]).

    t = J_l(omega) @ rho. Translation-first ordering matches the particle
    coordinate layout used throughout the ICP core (ref: SVNICP.cpp:74-77).
    """
    rho, omega = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(omega), rho)
    return R, t


def se3_log(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R, t) -> [rho(3), omega(3)] with rho = J_l(omega)^-1 t."""
    omega = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(omega), t)
    return jnp.concatenate([rho, omega], axis=-1)


# ---------------------------------------------------------------------------
# Rigid transform helpers on (R, t) pairs
# ---------------------------------------------------------------------------


def transform_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): first apply b, then a."""
    return _mm(Ra, Rb), jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def transform_inverse(R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    return Rinv, -jnp.einsum("...ij,...j->...i", Rinv, t)


def transform_points(R, t, pts):
    """Apply (R [3,3], t [3]) to pts [...,3]."""
    return jnp.einsum("ij,nj->ni", R, pts.reshape(-1, 3)).reshape(pts.shape) + t


def kabsch(src: jax.Array, tgt: jax.Array, w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Weighted closed-form rigid alignment (Kabsch / Umeyama).

    Returns (R [3,3], t [3]) minimizing sum_b w_b |R s_b + t - q_b|^2 via the
    SVD of the weighted cross-covariance, with the det-correction that keeps
    R a proper rotation. North-star addition (BASELINE.json: "SVD/Gauss-
    Newton pose updates on SE(3)"); the reference has no closed-form path.
    Padded/gated pairs enter with w=0.
    """
    sw = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.einsum("b,bi->i", w, src) / sw
    mu_t = jnp.einsum("b,bi->i", w, tgt) / sw
    cross = jnp.einsum("b,bi,bj->ij", w, tgt - mu_t, src - mu_s,
                       precision=jax.lax.Precision.HIGHEST)
    u, _, vt = jnp.linalg.svd(cross)
    d = jnp.linalg.det(jnp.matmul(u, vt))
    corr = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    r = jnp.matmul(u, jnp.matmul(corr, vt))
    t = mu_t - jnp.matmul(r, mu_s)
    return r, t


def interpolate_pose(R0, t0, R1, t1, alpha):
    """Geodesic interpolation T0 * exp(alpha * log(T0^-1 T1)) for scalar alpha."""
    Rd, td = transform_compose(*transform_inverse(R0, t0), R1, t1)
    xi = se3_log(Rd, td)
    Ri, ti = se3_exp(alpha * xi)
    return transform_compose(R0, t0, Ri, ti)


# ---------------------------------------------------------------------------
# Euler (ZYX / roll-pitch-yaw) parameterization used by the SVGD-ICP variant
# ---------------------------------------------------------------------------


def euler_zyx_to_matrix(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll); scalars -> [3,3] (vmap for batches).

    Same convention as the reference's Euler branch (SVGDICP.cpp:226-260).
    """
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    return jnp.stack(
        [
            jnp.stack([cp * cy, sr * sp * cy - cr * sy, sr * sy + cr * sp * cy], axis=-1),
            jnp.stack([cp * sy, cr * cy + sr * sp * sy, cr * sp * sy - sr * cy], axis=-1),
            jnp.stack([-sp, sr * cp, cr * cp], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_euler_zyx(R: jax.Array) -> jax.Array:
    """[3,3] -> [roll, pitch, yaw] (ref: SVGDICP.cpp:266-272)."""
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    sp = jnp.clip(-R[..., 2, 0], -1.0, 1.0)
    pitch = jnp.arctan2(sp, jnp.sqrt(jnp.maximum(1.0 - sp * sp, 0.0)))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler_zyx_partials(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    """Analytic dR/d(roll,pitch,yaw), stacked [3, 3, 3] (axis 0 = which angle).

    jnp re-derivation of the hand-expanded partials at SVGDICP.cpp:335-396,
    computed with jax.jacfwd over the closed-form Euler rotation — identical
    values, no 60-line trig expansion to maintain.
    """

    def _r(angles):
        return euler_zyx_to_matrix(angles[0], angles[1], angles[2])

    angles = jnp.stack([roll, pitch, yaw], axis=-1)
    jac = jax.jacfwd(_r)(angles)  # [3,3,3] with last axis = angle index
    return jnp.moveaxis(jac, -1, 0)


# Batched aliases (leading particle axis).
bso3_exp = jax.vmap(so3_exp)
bso3_log = jax.vmap(so3_log)
bso3_left_jacobian = jax.vmap(so3_left_jacobian)
beuler_to_matrix = jax.vmap(euler_zyx_to_matrix)
bmatrix_to_euler = jax.vmap(matrix_to_euler_zyx)
