"""Visualization/colormap/misc utils tests (ref src/misc/)."""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core import inverse_depth as idp
from visual_odometry_rs_tpu.utils import colormap, view


def test_viridis_table():
    t = colormap.viridis_table()
    assert t.shape == (256, 3) and t.dtype == np.uint8
    # endpoints of viridis: dark purple -> yellow
    assert t[0, 2] > t[0, 0]  # blue-ish start
    assert t[255, 0] > 200 and t[255, 1] > 200  # yellow end


def test_candidates_overlay():
    img = np.full((4, 4), 100, np.uint8)
    mask = np.zeros((4, 4), bool)
    mask[1, 2] = True
    rgb = view.candidates_on_image(img, mask)
    assert rgb.shape == (4, 4, 3)
    np.testing.assert_array_equal(rgb[1, 2], [255, 0, 0])
    np.testing.assert_array_equal(rgb[0, 0], [100, 100, 100])


def test_idepth_image_states():
    m = idp.InverseDepthMap(
        idepth=jnp.array([[1.0, 2.0], [0.0, 0.0]], jnp.float32),
        variance=jnp.array([[1e-4, 1e-4], [0.0, 0.0]], jnp.float32),
        state=jnp.array([[2, 2], [0, 1]], jnp.uint8),
    )
    rgb = view.idepth_image(m)
    np.testing.assert_array_equal(rgb[1, 0], [0, 0, 0])  # Unknown black
    np.testing.assert_array_equal(rgb[1, 1], [255, 0, 0])  # Discarded red
    assert (rgb[0, 0] != rgb[0, 1]).any()  # distinct idepths -> distinct colors


def test_save_png(tmp_path):
    rgb = np.zeros((4, 4, 3), np.uint8)
    view.save_png(str(tmp_path / "x.png"), rgb)
    from PIL import Image

    assert Image.open(tmp_path / "x.png").size == (4, 4)
