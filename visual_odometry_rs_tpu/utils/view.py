"""Debug visualization (ref ``src/misc/view.rs``).

- ``candidates_on_image``: overlay a candidate mask in red on a gray image
  (view.rs:16-27).
- ``idepth_image``: inverse-depth map → viridis RGB with Unknown = black and
  Discarded = red (view.rs:31-37, 76-90).

Host-side numpy; output arrays are (H, W, 3) uint8, saveable with PIL.
"""

from __future__ import annotations

import numpy as np

from ..core import inverse_depth as idepth_mod
from . import colormap


def gray_to_rgb(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.uint8)
    return np.stack([img, img, img], axis=-1)


def candidates_on_image(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Red overlay of selected candidates on the gray image (view.rs:16-27)."""
    out = gray_to_rgb(img)
    mask = np.asarray(mask, bool)
    out[mask] = np.array([255, 0, 0], np.uint8)
    return out


def idepth_image(m: idepth_mod.InverseDepthMap) -> np.ndarray:
    """Inverse-depth map → RGB: viridis over the known range, Unknown black,
    Discarded red (view.rs:31-90)."""
    idepth = np.asarray(m.idepth, np.float64)
    state = np.asarray(m.state)
    known = state == idepth_mod.WITH_VARIANCE
    if known.any():
        vmin = float(idepth[known].min())
        vmax = float(idepth[known].max())
    else:
        vmin, vmax = 0.0, 1.0
    rgb = colormap.viridis_float(idepth, vmin, vmax)
    rgb[~known] = 0
    rgb[state == idepth_mod.DISCARDED] = np.array([255, 0, 0], np.uint8)
    return rgb


def save_png(path: str, rgb: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(rgb, np.uint8)).save(path)
