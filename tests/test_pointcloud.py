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


def test_sliding_window_refined_cloud():
    """SlidingWindow.keyframe_cloud: the refined cloud stays anchored to
    the sensor-depth back-projection (the 1e4 idepth prior dominates on
    clean synthetic data), and retired clouds accumulate one per switch."""
    from visual_odometry_rs_tpu.models import sliding_window

    seq = synthetic.generate_sequence(
        nb_frames=8, height=120, width=160, seed=33,
        motion_scale=0.03, rot_scale=0.008,
    )
    config = tracker_mod.TrackerConfig(
        height=120, width=160, nb_levels=3, candidate_cap=1024,
        depth_scale=tum_rgbd.DEPTH_SCALE, interp_method="gather",
    )
    sw = sliding_window.SlidingWindow(
        config, seq.intrinsics, window_size=3, interp_method="gather",
        energy_tol=0.05, collect_clouds=True,
    )
    sw.start(jnp.asarray(seq.depths[0]), jnp.asarray(seq.grays[0]), seq.poses[0])

    # before any frame is added, the refined cloud IS the sensor cloud
    pts0, int0 = sw.keyframe_cloud()
    pts_sensor, int_sensor = pointcloud.keyframe_clouds(
        config, seq.intrinsics, [seq.depths[0]], [seq.grays[0]], [seq.poses[0]]
    )
    np.testing.assert_allclose(pts0, pts_sensor, atol=1e-5)
    np.testing.assert_array_equal(int0, int_sensor)

    for i in range(1, len(seq.grays)):
        sw.add_frame(
            jnp.asarray(seq.depths[i]), jnp.asarray(seq.grays[i]), seq.poses[i]
        )
    assert sw.keyframe_switches >= 1
    assert len(sw.retired_clouds) == sw.keyframe_switches
    all_pts = np.concatenate(
        [p for p, _ in sw.retired_clouds] + [sw.keyframe_cloud()[0]]
    )
    assert len(all_pts) > 100
    assert np.isfinite(all_pts).all()
    # refined depths stay near the sensor measurement on clean data: the
    # retired keyframe-0 cloud agrees with its sensor back-projection to
    # centimeter level for the bulk of points (a few % of low-gradient
    # candidates legitimately move further under the photometric term)
    ret0, _ = sw.retired_clouds[0]
    assert ret0.shape == pts_sensor.shape
    dev = np.linalg.norm(ret0 - pts_sensor, axis=1)
    assert np.median(dev) < 1e-2, np.median(dev)
    assert np.quantile(dev, 0.95) < 5e-2, np.quantile(dev, 0.95)
    assert dev.max() < 0.3, dev.max()


def test_voxel_downsample():
    """One centroid per voxel; empty and voxel=0 passthroughs; intensity
    averaging; order-independence of the cell membership."""
    pts = np.array(
        [[0.01, 0.01, 0.01], [0.04, 0.02, 0.03],   # same 0.1-voxel
         [0.11, 0.0, 0.0],                           # neighbor voxel in x
         [-0.01, 0.0, 0.0]],                         # negative cell
        np.float32,
    )
    inten = np.array([10, 20, 40, 80], np.uint8)
    out_p, out_i = pointcloud.voxel_downsample(pts, inten, 0.1)
    assert out_p.shape == (3, 3)
    # the merged voxel's centroid and mean intensity
    merged = np.isclose(out_p, [[0.025, 0.015, 0.02]], atol=1e-6).all(axis=1)
    assert merged.sum() == 1
    assert out_i[merged][0] == 15
    # passthroughs
    same_p, same_i = pointcloud.voxel_downsample(pts, inten, 0.0)
    np.testing.assert_array_equal(same_p, pts)
    empty_p, empty_i = pointcloud.voxel_downsample(
        np.zeros((0, 3), np.float32), np.zeros((0,), np.uint8), 0.1
    )
    assert len(empty_p) == 0 and len(empty_i) == 0
    # shuffling the input must not change the (sorted) result set
    perm = np.random.default_rng(0).permutation(len(pts))
    out_p2, _ = pointcloud.voxel_downsample(pts[perm], inten[perm], 0.1)
    np.testing.assert_allclose(
        np.sort(out_p2, axis=0), np.sort(out_p, axis=0), atol=1e-6
    )


def test_render_cloud_tool(tmp_path):
    """tools/render_cloud.py: orthographic PNG render of an exported map."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import render_cloud

    pts = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 2.0], [0.5, 0.2, 1.5]],
                   np.float32)
    inten = np.array([50, 200, 120], np.uint8)
    img = render_cloud.render(pts, inten, plane="xz", size=64)
    assert img.shape == (64, 64)
    assert (img > 0).sum() == 3  # three distinct splats
    assert img.max() == 200
    # empty cloud renders an empty image
    empty = render_cloud.render(np.zeros((0, 3), np.float32),
                                np.zeros((0,), np.uint8), size=32)
    assert empty.shape == (32, 32) and not empty.any()
    # CLI end-to-end through a PLY file
    ply = str(tmp_path / "m.ply")
    png = str(tmp_path / "m.png")
    pointcloud.write_ply(ply, pts, inten)
    rc = render_cloud.main([ply, png, "--size", "64"])
    assert rc == 0
    import os

    assert os.path.getsize(png) > 0
