"""TUM RGB-D dataset parsing/serialization/IO tests (ref src/dataset/tum_rgbd.rs)."""

import os

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.dataset import synthetic, tum_rgbd
from visual_odometry_rs_tpu.math.pose import Pose


def test_parse_associations_with_comments():
    content = """# comment line
1305031102.160407 depth/1305031102.160407.png 1305031102.175304 rgb/1305031102.175304.png
# another comment

1305031102.194330 depth/1305031102.194330.png 1305031102.211214 rgb/1305031102.211214.png
"""
    assocs = tum_rgbd.parse_associations(content)
    assert len(assocs) == 2
    assert assocs[0].depth_timestamp == 1305031102.160407
    assert assocs[1].color_file_path == "rgb/1305031102.211214.png"


def test_parse_trajectory_roundtrip():
    frame = tum_rgbd.Frame(
        timestamp=123.456,
        pose=Pose(
            q=jnp.array([0.8, 0.1, -0.2, 0.55], jnp.float32),
            t=jnp.array([1.5, -2.25, 0.125], jnp.float32),
        ),
    )
    line = frame.to_string()
    parts = line.split()
    assert len(parts) == 8
    # order: timestamp tx ty tz qx qy qz qw
    assert float(parts[1]) == 1.5 and float(parts[7]) == np.float32(0.8)
    parsed = tum_rgbd.parse_trajectory(line)[0]
    np.testing.assert_allclose(np.asarray(parsed.pose.t), [1.5, -2.25, 0.125], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(parsed.pose.q), [0.8, 0.1, -0.2, 0.55], rtol=1e-6)


def test_intrinsics_presets():
    k = tum_rgbd.intrinsics_fr1()
    np.testing.assert_allclose(float(k.fx), 517.306408, rtol=1e-6)
    k = tum_rgbd.intrinsics_icl_nuim()
    assert float(k.fy) == -480.0  # ICL-NUIM has negative fy (tum_rgbd.rs:23-27)


def test_write_and_read_sequence(tmp_path):
    seq = synthetic.generate_sequence(nb_frames=2, height=32, width=40, seed=0)
    assoc_path = tum_rgbd.write_sequence(
        str(tmp_path), seq.grays, seq.depths, seq.timestamps
    )
    assocs = tum_rgbd.load_associations(assoc_path)
    assert len(assocs) == 2
    assert os.path.isabs(assocs[0].depth_file_path)
    depth, gray = tum_rgbd.read_images(assocs[0])
    np.testing.assert_array_equal(depth, seq.depths[0])
    np.testing.assert_array_equal(gray, seq.grays[0])
    assert depth.dtype == np.uint16 and gray.dtype == np.uint8


def test_parse_error():
    import pytest

    with pytest.raises(ValueError):
        tum_rgbd.parse_associations("only three fields here\n")

def test_scaled_intrinsics():
    from visual_odometry_rs_tpu.dataset import tum_rgbd

    native = tum_rgbd.INTRINSICS["fr1"]()
    same = tum_rgbd.scaled_intrinsics("fr1", 480, 640)
    # identity at native resolution
    for a, b in zip(native, same):
        assert abs(float(a) - float(b)) < 1e-5
    half = tum_rgbd.scaled_intrinsics("fr1", 240, 320)
    # matches the pyramid's half-res convention (camera.rs:115-123)
    from visual_odometry_rs_tpu.core import camera as camera_mod

    expect = camera_mod.half_res(native)
    for a, b in zip(expect, half):
        assert abs(float(a) - float(b)) < 1e-4
