"""Batched quaternion / rotation math, xyzw convention.

All functions take arrays whose last axis is the component axis and broadcast
over any leading batch axes.  The xyzw layout matches the reference's
isaacgym/mocap convention (reference: bbc/legged_gym/utils/torch_jit_utils.py,
bbc/rsl_rl/datasets/pose3d.py) so mocap data and checkpoints interoperate.

Pure jnp — safe inside jit/vmap/shard_map and differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(tuple(shape) + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b (xyzw)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q:  R(q) v."""
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """R(q)^T v."""
    return quat_rotate(quat_conjugate(q), v)


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(q, v)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> (..., 3, 3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis (...,3), angle (...) -> quat (...,4)."""
    half = 0.5 * angle
    s = jnp.sin(half)[..., None]
    return jnp.concatenate([axis * s, jnp.cos(half)[..., None, ]], axis=-1)


def quat_from_euler_xyz(roll, pitch, yaw) -> jnp.ndarray:
    """Intrinsic x-y-z Euler angles -> quat (matches isaacgym quat_from_euler_xyz)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    qx = sr * cp * cy - cr * sp * sy
    qy = cr * sp * cy + sr * cp * sy
    qz = cr * cp * sy - sr * sp * cy
    qw = cr * cp * cy + sr * sp * sy
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def euler_from_quat(q: jnp.ndarray):
    """quat -> (roll, pitch, yaw); matches reference get_euler_xyz
    (bbc/legged_gym/utils/torch_jit_utils.py:169)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    return jnp.mod(angle + jnp.pi, 2 * jnp.pi) - jnp.pi


def calc_heading(q: jnp.ndarray) -> jnp.ndarray:
    """Yaw of the rotated x-axis (reference calc_heading,
    torch_jit_utils.py:~55)."""
    ref_dir = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def heading_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Pure-yaw quaternion with the heading of q."""
    h = calc_heading(q)
    z = jnp.zeros_like(h)
    axisq = jnp.stack([z, z, jnp.sin(h * 0.5), jnp.cos(h * 0.5)], axis=-1)
    return axisq


def heading_quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse heading rotation (reference calc_heading_quat_inv,
    torch_jit_utils.py:65)."""
    h = calc_heading(q)
    z = jnp.zeros_like(h)
    return jnp.stack([z, z, jnp.sin(-h * 0.5), jnp.cos(-h * 0.5)], axis=-1)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q (reference quat_apply_yaw,
    torch_jit_utils.py:118)."""
    return quat_rotate(heading_quat(q), v)


def quat_to_tan_norm(q: jnp.ndarray) -> jnp.ndarray:
    """6-d tangent/normal rotation encoding (reference quat_to_tan_norm)."""
    tan = quat_rotate(q, jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0))
    norm = quat_rotate(q, jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0))
    return jnp.concatenate([tan, norm], axis=-1)


def quat_standardize(q: jnp.ndarray) -> jnp.ndarray:
    """Nonnegative-w hemisphere (reference pose3d.standardize_quaternion:16)."""
    return jnp.where(q[..., 3:4] < 0, -q, q)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate unit quaternion by world-frame angular velocity over dt
    using the exponential map (exact for constant omega)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.maximum(angle, _EPS)
    half = 0.5 * angle * dt
    dq = jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)
    return normalize(quat_mul(dq, q))


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Batched spherical interpolation (reference rsl_rl/utils/utils.py:126).
    t broadcasts against leading axes of q0/q1."""
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else jnp.asarray(t)
    cos_half = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(cos_half < 0, -q1, q1)
    cos_half = jnp.abs(cos_half)
    half = jnp.arccos(jnp.clip(cos_half, -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    # fall back to lerp when the arc is tiny (sin_half ~ 0)
    small = sin_half < 1e-5
    r0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * half) / jnp.maximum(sin_half, _EPS))
    r1 = jnp.where(small, t, jnp.sin(t * half) / jnp.maximum(sin_half, _EPS))
    return normalize(r0 * q0 + r1 * q1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) cross-product matrix [v]×."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))
