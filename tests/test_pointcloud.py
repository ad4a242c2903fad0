"""Sparse 3D map export (utils/pointcloud.py).

Validates the geometry of the back-projection (points must land on the
rendered depth surface), the rigid-transform semantics of the pose
argument, and the PLY serialization round-trip.
"""

import numpy as np
import jax.numpy as jnp

from visual_odometry_rs_tpu.core import camera as camera_mod
from visual_odometry_rs_tpu.dataset import synthetic, tum_rgbd
from visual_odometry_rs_tpu.math import pose as pose_mod, se3
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.utils import pointcloud


def _scene():
    seq = synthetic.generate_sequence(nb_frames=2, height=120, width=160, seed=9)
    config = tracker_mod.TrackerConfig(
        height=120, width=160, nb_levels=3, candidate_cap=1024,
        depth_scale=tum_rgbd.DEPTH_SCALE,
    )
    return seq, config


def test_cloud_points_lie_on_depth_surface():
    seq, config = _scene()
    pts, inten = pointcloud.keyframe_clouds(
        config, seq.intrinsics, [seq.depths[0]], [seq.grays[0]],
        [pose_mod.identity()],
    )
    assert len(pts) > 50
    assert np.isfinite(pts).all()
    # identity pose: world == camera frame.  Re-project each point; it must
    # land on an integer pixel whose u16 depth/DEPTH_SCALE equals its z.
    proj = np.asarray(camera_mod.project(seq.intrinsics, jnp.asarray(pts)))
    u = proj[:, 0] / proj[:, 2]
    v = proj[:, 1] / proj[:, 2]
    ui, vi = np.rint(u).astype(int), np.rint(v).astype(int)
    np.testing.assert_allclose(u, ui, atol=1e-3)
    np.testing.assert_allclose(v, vi, atol=1e-3)
    depth_m = seq.depths[0][vi, ui].astype(np.float64) / tum_rgbd.DEPTH_SCALE
    np.testing.assert_allclose(pts[:, 2], depth_m, rtol=1e-5, atol=1e-5)
    # intensities are the template values at those pixels
    np.testing.assert_array_equal(inten, seq.grays[0][vi, ui])


def test_cloud_pose_is_rigid_transform():
    seq, config = _scene()
    c2w = se3.exp(jnp.asarray([0.3, -0.1, 0.2, 0.1, -0.2, 0.15], jnp.float32))
    pts_id, _ = pointcloud.keyframe_clouds(
        config, seq.intrinsics, [seq.depths[0]], [seq.grays[0]],
        [pose_mod.identity()],
    )
    pts_tf, _ = pointcloud.keyframe_clouds(
        config, seq.intrinsics, [seq.depths[0]], [seq.grays[0]], [c2w],
    )
    # same images -> same candidates in the same order; the pose must act as
    # R x + t on every point
    expect = np.asarray(pose_mod.apply(c2w, jnp.asarray(pts_id)))
    np.testing.assert_allclose(pts_tf, expect, atol=1e-4)


def test_multi_keyframe_concatenation():
    seq, config = _scene()
    pts1, int1 = pointcloud.keyframe_clouds(
        config, seq.intrinsics, [seq.depths[0]], [seq.grays[0]],
        [pose_mod.identity()],
    )
    pts2, int2 = pointcloud.keyframe_clouds(
        config, seq.intrinsics,
        [seq.depths[0], seq.depths[1]], [seq.grays[0], seq.grays[1]],
        [pose_mod.identity(), seq.poses[1]],
    )
    # first keyframe's block is unchanged by batching
    np.testing.assert_allclose(pts2[: len(pts1)], pts1, atol=1e-5)
    np.testing.assert_array_equal(int2[: len(int1)], int1)
    assert len(pts2) > len(pts1)


def test_ply_roundtrip(tmp_path):
    pts = np.array([[0.1, -0.2, 1.5], [2.0, 0.0, 3.25]], np.float32)
    inten = np.array([0, 255], np.uint8)
    path = str(tmp_path / "map.ply")
    pointcloud.write_ply(path, pts, inten)
    rpts, rint = pointcloud.read_ply(path)
    np.testing.assert_allclose(rpts, pts, atol=1e-5)
    np.testing.assert_array_equal(rint, inten)
