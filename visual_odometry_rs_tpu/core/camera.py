"""Pinhole camera model: intrinsics, projection, multi-resolution scaling.

Capability parity with reference ``src/core/camera.rs``: ``Intrinsics``
(principal point, focal, skew), ``project``/``back_project``
(camera.rs:126-140), the per-halving ``+0.5 / -0.5`` principal-point shift
(camera.rs:115-123), and the ``Camera`` = intrinsics + extrinsics pairing with
world↔camera projections (camera.rs:18-77).

Intrinsics are a tiny pytree of f32 scalars (or batched arrays), trivially
jittable and vmappable.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp

from ..math import pose as _pose
from ..math.pose import Pose
from ..utils.types import Float


class Intrinsics(NamedTuple):
    """Pinhole intrinsics. Fields broadcast (scalars or batched arrays)."""

    cx: jnp.ndarray
    cy: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    skew: jnp.ndarray

    @staticmethod
    def make(cx, cy, fx, fy, skew=0.0) -> "Intrinsics":
        return Intrinsics(*(jnp.asarray(v, dtype=Float) for v in (cx, cy, fx, fy, skew)))


def matrix(k: Intrinsics) -> jnp.ndarray:
    """3x3 calibration matrix (camera.rs:96-102)."""
    z = jnp.zeros_like(k.fx)
    o = jnp.ones_like(k.fx)
    m = jnp.stack([k.fx, k.skew, k.cx, z, k.fy, k.cy, z, z, o], axis=-1)
    return m.reshape(*jnp.shape(k.fx), 3, 3)


def half_res(k: Intrinsics) -> Intrinsics:
    """Intrinsics of the half-resolution camera (camera.rs:115-123).

    (0,0) is the *center* of the first pixel, hence the +0.5/-0.5 shift of
    the principal point around the scaling.
    """
    return Intrinsics(
        cx=(k.cx + 0.5) / 2.0 - 0.5,
        cy=(k.cy + 0.5) / 2.0 - 0.5,
        fx=0.5 * k.fx,
        fy=0.5 * k.fy,
        skew=k.skew,
    )


def multi_res(k: Intrinsics, n: int) -> List[Intrinsics]:
    """n levels of halved intrinsics (camera.rs:106-108)."""
    out = [k]
    for _ in range(1, n):
        out.append(half_res(out[-1]))
    return out


def project(k: Intrinsics, point: jnp.ndarray) -> jnp.ndarray:
    """3D camera-frame point(s) (…,3) → homogeneous pixel (…,3) (camera.rs:126-132)."""
    x, y, z = point[..., 0], point[..., 1], point[..., 2]
    return jnp.stack(
        [k.fx * x + k.skew * y + k.cx * z, k.fy * y + k.cy * z, z], axis=-1
    )


def back_project(k: Intrinsics, point: jnp.ndarray, depth) -> jnp.ndarray:
    """Pixel (…,2) + depth → 3D camera-frame point (…,3) (camera.rs:135-140)."""
    z = jnp.broadcast_to(jnp.asarray(depth, dtype=Float), point[..., 1].shape)
    y = (point[..., 1] - k.cy) * z / k.fy
    x = ((point[..., 0] - k.cx) * z - k.skew * y) / k.fx
    return jnp.stack([x, y, z], axis=-1)


# --- Camera: intrinsics + extrinsics (pose of the camera) ------------------


class Camera(NamedTuple):
    """Intrinsics + extrinsics; extrinsics is the camera *pose* (camera.rs:12-23)."""

    intrinsics: Intrinsics
    extrinsics: Pose


def world_to_camera(extrinsics: Pose, point: jnp.ndarray) -> jnp.ndarray:
    """World → camera coordinates: ``R^-1 (p - t)`` (camera.rs:70-72)."""
    return _pose.quat_rotate(_pose.quat_conj(extrinsics.q), point - extrinsics.t)


def camera_to_world(extrinsics: Pose, point: jnp.ndarray) -> jnp.ndarray:
    """Camera → world coordinates: ``pose * p`` (camera.rs:75-77)."""
    return _pose.apply(extrinsics, point)


def camera_project(cam: Camera, point: jnp.ndarray) -> jnp.ndarray:
    """World point → homogeneous pixel (camera.rs:36-39)."""
    return project(cam.intrinsics, world_to_camera(cam.extrinsics, point))


def camera_back_project(cam: Camera, point: jnp.ndarray, depth) -> jnp.ndarray:
    """Pixel + depth → world point (camera.rs:43-45)."""
    return camera_to_world(cam.extrinsics, back_project(cam.intrinsics, point, depth))


def camera_multi_res(cam: Camera, n: int) -> List[Camera]:
    """Multi-resolution camera: intrinsics scaled, extrinsics intact (camera.rs:49-57)."""
    return [Camera(k, cam.extrinsics) for k in multi_res(cam.intrinsics, n)]


def warp(model: Pose, x, y, idepth, k: Intrinsics):
    """Warp pixel(s) (x, y) with inverse depth by rigid motion ``model``.

    ``back_project(・, 1/idepth) → model * ・ → project → dehomogenize``
    (ref lm_optimizer.rs:213-219 / inverse_compositional.rs:352-358).
    Returns (u, v) float pixel coordinates in the target image.
    """
    p2 = jnp.stack([jnp.asarray(x, Float), jnp.asarray(y, Float)], axis=-1)
    x1 = back_project(k, p2, 1.0 / jnp.asarray(idepth, Float))
    x2 = _pose.apply(model, x1)
    uvz = project(k, x2)
    return uvz[..., 0] / uvz[..., 2], uvz[..., 1] / uvz[..., 2]
