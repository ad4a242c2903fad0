"""Determinism and misc-utils tests (SURVEY §5: the analog of the
reference's race-detection rigor — bitwise repeatability across runs)."""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.utils import helper, interop


def test_tracking_bitwise_deterministic():
    seq = synthetic.generate_sequence(nb_frames=3, height=48, width=64, seed=0)
    config = tracker_mod.TrackerConfig(height=48, width=64, nb_levels=3, candidate_cap=256)

    def run():
        trk = tracker_mod.init_tracker(
            config, seq.intrinsics,
            float(seq.timestamps[0]), jnp.asarray(seq.depths[0]),
            float(seq.timestamps[0]), jnp.asarray(seq.grays[0]),
        )
        out = []
        for f in (1, 2):
            trk.track(float(seq.timestamps[f]), jnp.asarray(seq.depths[f]),
                      float(seq.timestamps[f]), jnp.asarray(seq.grays[f]))
            out.append(np.asarray(trk.current_pose.t).copy())
        return out

    a = run()
    b = run()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)  # bitwise, not approximate


def test_synthetic_generation_deterministic():
    s1 = synthetic.generate_sequence(nb_frames=2, height=32, width=40, seed=7)
    s2 = synthetic.generate_sequence(nb_frames=2, height=32, width=40, seed=7)
    np.testing.assert_array_equal(s1.grays, s2.grays)
    np.testing.assert_array_equal(s1.depths, s2.depths)


def test_zip_mask_map():
    m = jnp.array([[1, 2], [3, 4]])
    mask = jnp.array([[True, False], [False, True]])
    out = helper.zip_mask_map(m, mask, -1, lambda x: x * 10)
    np.testing.assert_array_equal(np.asarray(out), [[10, -1], [-1, 40]])


def test_div_rem():
    assert helper.div_rem(7, 2) == (3, 1)
    assert helper.div_rem(8, 2) == (4, 0)


def test_interop_roundtrip():
    rng = np.random.default_rng(0)
    mat = rng.integers(0, 256, (6, 8), np.uint8)
    img = interop.image_from_matrix(mat)
    back = interop.matrix_from_image(img)
    np.testing.assert_array_equal(back, mat)


def test_interop_luma_weights():
    rgb = np.zeros((1, 1, 3), np.uint8)
    rgb[0, 0] = [100, 200, 50]
    luma = interop.matrix_from_image(rgb)
    assert int(luma[0, 0]) == (299 * 100 + 587 * 200 + 114 * 50) // 1000
