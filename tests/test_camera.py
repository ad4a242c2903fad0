"""Camera model tests (ref src/core/camera.rs)."""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core import camera
from visual_odometry_rs_tpu.math import pose, se3

FR1 = camera.Intrinsics.make(318.643040, 255.313989, 517.306408, 516.469215)


def test_half_res_principal_point_shift():
    # (cx + 0.5)/2 - 0.5 (camera.rs:115-123)
    k = camera.Intrinsics.make(319.5, 239.5, 481.2, -480.0)
    h = camera.half_res(k)
    np.testing.assert_allclose(float(h.cx), (319.5 + 0.5) / 2 - 0.5)
    np.testing.assert_allclose(float(h.cy), (239.5 + 0.5) / 2 - 0.5)
    np.testing.assert_allclose(float(h.fx), 240.6)
    np.testing.assert_allclose(float(h.fy), -240.0)


def test_multi_res_levels():
    levels = camera.multi_res(FR1, 6)
    assert len(levels) == 6
    np.testing.assert_allclose(float(levels[5].fx), float(FR1.fx) / 32, rtol=1e-6)


def test_project_backproject_roundtrip():
    pts = jnp.array([[100.0, 200.0], [5.5, 3.25], [320.0, 240.0]])
    depth = jnp.array([2.0, 0.5, 1.0])
    p3 = camera.back_project(FR1, pts, depth)
    uvz = camera.project(FR1, p3)
    uv = uvz[:, :2] / uvz[:, 2:3]
    np.testing.assert_allclose(np.asarray(uv), np.asarray(pts), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uvz[:, 2]), np.asarray(depth), rtol=1e-6)


def test_project_with_skew():
    k = camera.Intrinsics.make(10.0, 20.0, 100.0, 110.0, skew=2.5)
    p3 = camera.back_project(k, jnp.array([[33.0, 44.0]]), 3.0)
    uvz = camera.project(k, p3)
    np.testing.assert_allclose(np.asarray(uvz[0, :2] / uvz[0, 2]), [33.0, 44.0], rtol=1e-5)


def test_intrinsics_matrix():
    k = camera.Intrinsics.make(1.0, 2.0, 3.0, 4.0, 0.5)
    m = np.asarray(camera.matrix(k))
    np.testing.assert_array_equal(m, [[3.0, 0.5, 1.0], [0.0, 4.0, 2.0], [0.0, 0.0, 1.0]])


def test_world_camera_roundtrip():
    ext = se3.exp(jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.1]))
    pt = jnp.array([1.0, 2.0, 3.0])
    cam_pt = camera.world_to_camera(ext, pt)
    back = camera.camera_to_world(ext, cam_pt)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pt), atol=1e-5)


def test_warp_identity_is_identity():
    # Warping with the identity motion must return the same pixel.
    u, v = camera.warp(pose.identity(), 123.0, 210.0, 0.5, FR1)
    np.testing.assert_allclose([float(u), float(v)], [123.0, 210.0], atol=1e-3)


def test_warp_pure_z_translation_moves_toward_center():
    # Moving the camera forward (scene backward in camera frame, z+) shrinks
    # the offset from the principal point.
    model = pose.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, 1.0]))
    x, y = 400.0, 300.0
    u, v = camera.warp(model, x, y, 0.5, FR1)  # depth 2m -> 3m
    cx, cy = float(FR1.cx), float(FR1.cy)
    assert abs(float(u) - cx) < abs(x - cx)
    assert abs(float(v) - cy) < abs(y - cy)
    # exact similar-triangles check: offsets scale by z/(z+1) = 2/3
    np.testing.assert_allclose(float(u) - cx, (x - cx) * 2 / 3, rtol=1e-4)
