"""Coarse-to-fine candidate selection demo.

Mirrors reference ``examples/candidates_coarse-to-fine.rs``: 6-level mean
pyramid, gradient squared norms, threshold 7; prints per-level candidate
counts and saves per-level overlay PNGs to ./out/.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core.candidates import coarse_to_fine
from visual_odometry_rs_tpu.ops import gradient, pyramid
from visual_odometry_rs_tpu.utils import view


def make_image():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (60, 80), np.uint8)
    return np.kron(base, np.ones((8, 8), np.uint8))


def main():
    if len(sys.argv) > 1:
        from visual_odometry_rs_tpu.dataset.tum_rgbd import read_gray

        img = read_gray(sys.argv[1])
    else:
        img = make_image()
    img = jnp.asarray(img)
    pyr = pyramid.mean_pyramid(6, img)
    grads = [gradient.centered(pyr[0])]
    grads.extend(gradient.gradients_xy(pyr))
    sqn = [gradient.squared_norm(gx, gy) for gx, gy in grads]
    masks = coarse_to_fine.select(7, sqn)

    os.makedirs("out", exist_ok=True)
    # masks are ordered coarse -> fine; reversed pairs them with pyramid
    # levels 0 (finest) upward
    for lvl, mask in enumerate(reversed(masks)):
        count = int(jnp.sum(mask))
        print(f"level {lvl}: {count} candidates")
        view.save_png(
            f"out/candidates_level_{lvl}.png",
            view.candidates_on_image(np.asarray(pyr[lvl]), np.asarray(mask)),
        )
    print("overlays saved to ./out/")


if __name__ == "__main__":
    main()
