"""Native C++ data-loader tests (native/vors_io.cpp via ctypes).

Parity anchor: the native decode paths must be byte-identical to the
pure-Python PIL fallbacks in ``dataset.tum_rgbd`` (which themselves mirror
reference helper.rs:13-36 and image::to_luma).  All tests skip when the
toolchain/libpng is unavailable — the library is optional by design.
"""

import numpy as np
import pytest
from PIL import Image

from visual_odometry_rs_tpu import native
from visual_odometry_rs_tpu.dataset import synthetic, tum_rgbd

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native IO library unavailable"
)


@pytest.fixture(scope="module")
def sequence_dir(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("tum_seq"))
    seq = synthetic.generate_sequence(nb_frames=4, height=32, width=40, seed=3)
    assoc_path = tum_rgbd.write_sequence(
        directory,
        np.asarray(seq.grays),
        np.asarray(seq.depths),
        np.arange(4, dtype=np.float64),
    )
    return assoc_path


def test_png_dims(sequence_dir):
    assocs = tum_rgbd.load_associations(sequence_dir)
    assert native.png_dims(assocs[0].depth_file_path) == (32, 40)


def test_read_png16_matches_pil(sequence_dir):
    assocs = tum_rgbd.load_associations(sequence_dir)
    for a in assocs:
        got = native.read_png_16bits(a.depth_file_path)
        want = np.asarray(Image.open(a.depth_file_path)).astype(np.uint16)
        assert got.dtype == np.uint16
        np.testing.assert_array_equal(got, want)


def test_read_gray_matches_pil(sequence_dir):
    assocs = tum_rgbd.load_associations(sequence_dir)
    got = native.read_gray(assocs[0].color_file_path)
    want = np.asarray(Image.open(assocs[0].color_file_path)).astype(np.uint8)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_read_gray_rgb_luma(tmp_path):
    # RGB -> BT.601 integer luma, matching the Python fallback exactly.
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    path = str(tmp_path / "rgb.png")
    Image.fromarray(rgb, mode="RGB").save(path)
    got = native.read_gray(path)
    r = rgb.astype(np.uint32)
    want = ((299 * r[..., 0] + 587 * r[..., 1] + 114 * r[..., 2]) // 1000).astype(
        np.uint8
    )
    np.testing.assert_array_equal(got, want)


def test_read_png16_rejects_8bit(tmp_path):
    path = str(tmp_path / "gray8.png")
    Image.fromarray(np.zeros((8, 8), np.uint8), mode="L").save(path)
    with pytest.raises(IOError):
        native.read_png_16bits(path)


def test_prefetch_loader_in_order(sequence_dir):
    assocs = tum_rgbd.load_associations(sequence_dir)
    with native.PrefetchLoader(
        [a.depth_file_path for a in assocs],
        [a.color_file_path for a in assocs],
        32,
        40,
        num_threads=3,
        max_ahead=2,
    ) as loader:
        frames = list(loader)
    assert len(frames) == len(assocs)
    for (depth, gray), a in zip(frames, assocs):
        np.testing.assert_array_equal(depth, tum_rgbd.read_png_16bits(a.depth_file_path))
        np.testing.assert_array_equal(gray, tum_rgbd.read_gray(a.color_file_path))


def test_frame_loader_generator(sequence_dir):
    assocs = tum_rgbd.load_associations(sequence_dir)
    frames = list(tum_rgbd.frame_loader(assocs))
    assert len(frames) == len(assocs)
    d0, g0 = tum_rgbd.read_images(assocs[0])
    np.testing.assert_array_equal(frames[0][0], d0)
    np.testing.assert_array_equal(frames[0][1], g0)


def test_prefetch_loader_reports_decode_error(tmp_path, sequence_dir):
    assocs = tum_rgbd.load_associations(sequence_dir)
    bad = str(tmp_path / "missing.png")
    with native.PrefetchLoader(
        [bad], [assocs[0].color_file_path], 32, 40
    ) as loader:
        with pytest.raises(IOError):
            next(loader)
