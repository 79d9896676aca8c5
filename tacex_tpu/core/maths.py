"""Batched quaternion / rigid-transform math (JAX).

Covers the surface of ``isaaclab.utils.math`` that the reference framework
actually touches (quat rotate/mul/inverse, frame subtraction, euler/yaw
extraction, axis-angle errors — see e.g. reference
source/tacex/tacex/gelsight_sensor.py and the task envs' IK controllers).

Conventions: quaternions are (w, x, y, z), unit-norm; all functions broadcast
over leading batch axes and are jit/vmap-safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_identity(batch_shape: tuple[int, ...] = ()) -> jax.Array:
    q = jnp.zeros(batch_shape + (4,)).at[..., 0].set(1.0)
    return q


def quat_normalize(q: jax.Array, eps: float = 1e-9) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


quat_inv = quat_conjugate  # unit quaternions


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) ``v`` by quaternion(s) ``q`` (Rodrigues form, no matmul)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


quat_rotate = quat_apply


def quat_apply_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_apply(quat_conjugate(q), v)


quat_rotate_inverse = quat_apply_inverse


def matrix_from_quat(q: jax.Array) -> jax.Array:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
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
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(m: jax.Array) -> jax.Array:
    """Branch-free (smooth-max weighted) rotation-matrix → quaternion."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions; pick the numerically best with where-chains.
    qw = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) / 2.0
    case = jnp.argmax(qw, axis=-1)

    w0, x0 = qw[..., 0], (m21 - m12) / (4 * qw[..., 0])
    y0, z0 = (m02 - m20) / (4 * qw[..., 0]), (m10 - m01) / (4 * qw[..., 0])
    x1, w1 = qw[..., 1], (m21 - m12) / (4 * qw[..., 1])
    y1, z1 = (m01 + m10) / (4 * qw[..., 1]), (m02 + m20) / (4 * qw[..., 1])
    y2, w2 = qw[..., 2], (m02 - m20) / (4 * qw[..., 2])
    x2, z2 = (m01 + m10) / (4 * qw[..., 2]), (m12 + m21) / (4 * qw[..., 2])
    z3, w3 = qw[..., 3], (m10 - m01) / (4 * qw[..., 3])
    x3, y3 = (m02 + m20) / (4 * qw[..., 3]), (m12 + m21) / (4 * qw[..., 3])

    qs = jnp.stack(
        [
            jnp.stack([w0, x0, y0, z0], -1),
            jnp.stack([w1, x1, y1, z1], -1),
            jnp.stack([w2, x2, y2, z2], -1),
            jnp.stack([w3, x3, y3, z3], -1),
        ],
        axis=-2,
    )
    q = jnp.take_along_axis(qs, case[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    half = angle * 0.5
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([w[..., None], xyz], axis=-1)


def quat_from_euler_xyz(roll: jax.Array, pitch: jax.Array, yaw: jax.Array) -> jax.Array:
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def euler_xyz_from_quat(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return roll, pitch, yaw


def yaw_from_quat(q: jax.Array) -> jax.Array:
    return euler_xyz_from_quat(q)[2]


def axis_angle_from_quat(q: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rotation vector (axis * angle) from quaternion; smooth near identity."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    xyz = q[..., 1:4]
    sin_half = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 0:1])
    # sinc-style safe division
    scale = jnp.where(sin_half > eps, angle / jnp.maximum(sin_half, eps), 2.0)
    return xyz * scale


def quat_error_magnitude(q1: jax.Array, q2: jax.Array) -> jax.Array:
    dq = quat_mul(q1, quat_conjugate(q2))
    return jnp.linalg.norm(axis_angle_from_quat(dq), axis=-1)


def quat_unique(q: jax.Array) -> jax.Array:
    """Canonicalize sign so w >= 0."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def combine_frame_transforms(
    t01: jax.Array, q01: jax.Array, t12: jax.Array, q12: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Pose of frame 2 in frame 0 given pose of 1-in-0 and 2-in-1."""
    t02 = t01 + quat_apply(q01, t12)
    q02 = quat_mul(q01, q12)
    return t02, q02


def subtract_frame_transforms(
    t01: jax.Array, q01: jax.Array, t02: jax.Array, q02: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Pose of frame 2 in frame 1 given poses of 1 and 2 in frame 0."""
    q10 = quat_conjugate(q01)
    t12 = quat_apply(q10, t02 - t01)
    q12 = quat_mul(q10, q02)
    return t12, q12


def transform_points(points: jax.Array, pos: jax.Array, quat: jax.Array) -> jax.Array:
    """Apply rigid transform to (..., N, 3) points; pos (...,3), quat (...,4)."""
    return quat_apply(quat[..., None, :], points) + pos[..., None, :]


def sample_uniform(key: jax.Array, lower, upper, shape: tuple[int, ...]) -> jax.Array:
    lower = jnp.asarray(lower)
    upper = jnp.asarray(upper)
    return jax.random.uniform(key, shape, minval=0.0, maxval=1.0) * (upper - lower) + lower


def scale_transform(x: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Map [lower, upper] → [-1, 1]."""
    offset = (lower + upper) * 0.5
    return 2.0 * (x - offset) / (upper - lower)


def unscale_transform(x: jax.Array, lower: jax.Array, upper: jax.Array) -> jax.Array:
    """Map [-1, 1] → [lower, upper]."""
    offset = (lower + upper) * 0.5
    return x * (upper - lower) * 0.5 + offset
