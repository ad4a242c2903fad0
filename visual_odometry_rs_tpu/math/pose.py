"""Rigid-body motions (direct isometries of R^3) as a JAX pytree.

The reference represents poses with nalgebra's ``Isometry3<f32>`` (alias
``Iso3``, ``src/misc/type_aliases.rs:28``): a unit quaternion plus a
translation.  We keep exactly that parameterization — a quaternion stored
``[w, x, y, z]`` and a translation ``[x, y, z]`` — as a NamedTuple pytree so
poses vmap/jit/shard transparently and batch over arbitrary leading axes.

All operations mirror nalgebra's semantics:

- ``compose(a, b)``: quaternion product for rotations, ``t = a.t + a.R b.t``.
- ``inverse(p)``: conjugate quaternion, ``t' = -(R^-1 t)``.
- ``apply(p, x)``: ``R x + t`` with the rotation applied by the cross-product
  formula nalgebra uses for ``UnitQuaternion::transform_vector``
  (``v + w*(2 u×v) + u×(2 u×v)``) — NOT the normalized sandwich product, which
  matters because the tracker intentionally works with *approximately* unit
  quaternions between first-order renormalizations
  (ref ``core/track/lm_optimizer.rs:205-209``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.types import Float


class Pose(NamedTuple):
    """A rigid-body motion: quaternion ``q=[w,x,y,z]`` (…,4), translation ``t`` (…,3)."""

    q: jnp.ndarray
    t: jnp.ndarray


def identity(batch_shape=()) -> Pose:
    q = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0], dtype=Float), (*batch_shape, 4))
    t = jnp.zeros((*batch_shape, 3), dtype=Float)
    return Pose(q, t)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of quaternions stored [w, x, y, z]."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses nalgebra's cross-product form (exact for unit quaternions):
    ``t = 2 u×v;  v' = v + w t + u×t``.
    """
    u = q[..., 1:]
    w = q[..., :1]
    tv = 2.0 * jnp.cross(u, v)
    return v + w * tv + jnp.cross(u, tv)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b (apply b first, then a), like nalgebra's ``Iso3 * Iso3``."""
    return Pose(quat_mul(a.q, b.q), a.t + quat_rotate(a.q, b.t))


def inverse(p: Pose) -> Pose:
    qi = quat_conj(p.q)
    return Pose(qi, -quat_rotate(qi, p.t))


def apply(p: Pose, x: jnp.ndarray) -> jnp.ndarray:
    """Apply the rigid motion to 3D point(s): ``R x + t``."""
    return quat_rotate(p.q, x) + p.t


def renormalize_first_order(p: Pose) -> Pose:
    """First-order Taylor renormalization of the rotation quaternion.

    ``q' = 0.5 (3 - |q|^2) q`` — exactly the cheap renormalization the
    reference applies after every inverse-compositional update
    (ref ``core/track/lm_optimizer.rs:205-209``).
    """
    sq_norm = jnp.sum(p.q * p.q, axis=-1, keepdims=True)
    return Pose(0.5 * (3.0 - sq_norm) * p.q, p.t)


def rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [w,x,y,z] → 3x3 rotation matrix (batched over leading axes)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(*q.shape[:-1], 3, 3)


def matrix(p: Pose) -> jnp.ndarray:
    """Pose → 4x4 homogeneous matrix."""
    R = rotation_matrix(p.q)
    top = jnp.concatenate([R, p.t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.t.dtype), (*p.t.shape[:-1], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def from_euler_angles(roll, pitch, yaw) -> jnp.ndarray:
    """Quaternion from extrinsic x-y-z Euler angles (nalgebra's convention:
    ``R = Rz(yaw) Ry(pitch) Rx(roll)``). Used by property-test generators
    (ref ``src/math/so3.rs:146-148``)."""
    roll = jnp.asarray(roll, dtype=Float)
    pitch = jnp.asarray(pitch, dtype=Float)
    yaw = jnp.asarray(yaw, dtype=Float)
    hr, hp, hy = 0.5 * roll, 0.5 * pitch, 0.5 * yaw
    qx = jnp.stack([jnp.cos(hr), jnp.sin(hr), jnp.zeros_like(hr), jnp.zeros_like(hr)], -1)
    qy = jnp.stack([jnp.cos(hp), jnp.zeros_like(hp), jnp.sin(hp), jnp.zeros_like(hp)], -1)
    qz = jnp.stack([jnp.cos(hy), jnp.zeros_like(hy), jnp.zeros_like(hy), jnp.sin(hy)], -1)
    return quat_mul(qz, quat_mul(qy, qx))
