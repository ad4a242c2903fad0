"""Image ↔ array interop and layout conventions (ref ``src/misc/interop.rs``).

The reference converts between row-major images and nalgebra's column-major
matrices (interop.rs:16-56); numpy/JAX arrays are row-major natively, so the
only convention to document and enforce here is: **arrays are indexed
(row, col) = (v, u)**, i.e. ``img[y, x]``, exactly like the reference's
matrices.  Candidate coordinates throughout the library are ``(x, y) =
(col, row)`` pairs, matching the reference's ``(u, v)`` tuples.
"""

from __future__ import annotations

import numpy as np


def matrix_from_image(img) -> np.ndarray:
    """PIL image (or array-like) → (H, W) u8 array (interop.rs:53-56)."""
    arr = np.asarray(img)
    if arr.ndim == 3:
        # luma conversion with the Rust image crate's integer BT.601 weights
        rgb = arr[..., :3].astype(np.uint32)
        arr = ((299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000).astype(
            np.uint8
        )
    return arr.astype(np.uint8)


def image_from_matrix(mat: np.ndarray):
    """(H, W) u8 array → PIL gray image (interop.rs:16-23)."""
    from PIL import Image

    return Image.fromarray(np.asarray(mat, np.uint8), mode="L")


def rgb_image_from_matrix(mat: np.ndarray):
    """(H, W, 3) u8 array → PIL RGB image (interop.rs:30-38)."""
    from PIL import Image

    return Image.fromarray(np.asarray(mat, np.uint8), mode="RGB")
