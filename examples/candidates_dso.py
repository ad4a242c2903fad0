"""DSO candidate selection demo targeting 2000 points.

Mirrors reference ``examples/candidates_dso.rs``: gradient norm input,
nb_iterations_left = 2, saves an overlay PNG.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core.candidates import dso
from visual_odometry_rs_tpu.ops import gradient
from visual_odometry_rs_tpu.utils import view


def main():
    if len(sys.argv) > 1:
        from visual_odometry_rs_tpu.dataset.tum_rgbd import read_gray

        img = read_gray(sys.argv[1])
    else:
        rng = np.random.default_rng(0)
        base = rng.integers(0, 256, (60, 80), np.uint8)
        img = np.kron(base, np.ones((8, 8), np.uint8))
    img = jnp.asarray(img)
    grads = gradient.norm_direct(img)
    mask = dso.select(
        grads, 2000,
        recursive_config=dso.RecursiveConfig(nb_iterations_left=2, low_thresh=0.8,
                                             high_thresh=4.0, random_thresh=1.1),
    )
    print(f"Number of candidate points: {int(jnp.sum(mask))}")
    os.makedirs("out", exist_ok=True)
    view.save_png(
        "out/candidates_dso.png",
        view.candidates_on_image(np.asarray(img), np.asarray(mask)),
    )
    print("overlay saved to ./out/candidates_dso.png")


if __name__ == "__main__":
    main()
