"""Pyramidal inverse-compositional affine alignment demo.

Mirrors reference ``examples/optim_affine-2d.rs``: extract a random affine
template from an image (seeded here, unlike the reference's thread_rng),
align it back, print ground truth vs computed warp.

Usage: python examples/optim_affine2d.py [image.png]
(without an argument a synthetic smooth image is used)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.models import affine2d


def load_or_make_image(argv):
    if len(argv) > 1:
        from visual_odometry_rs_tpu.dataset.tum_rgbd import read_gray

        return read_gray(argv[1])
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float64)
    img = np.zeros((240, 320))
    for _ in range(8):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        img += rng.uniform(0.3, 1.0) * np.sin(
            2 * np.pi * (fx * xx / 320 + fy * yy / 240) + rng.uniform(0, 6.28)
        )
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def main():
    img = load_or_make_image(sys.argv)
    template, affine_gt = affine2d.random_template(img, seed=0)
    nb_levels = affine2d.default_nb_levels(*img.shape)
    print(f"nb_levels = {nb_levels}")
    params, failed = affine2d.align(
        jnp.asarray(template), jnp.asarray(img), nb_levels
    )
    print("Ground truth:")
    print(affine_gt)
    print("Computed:")
    print(np.asarray(affine2d.warp_matrix(params))[:2, :])
    if bool(failed):
        print("warning: a level failed its Cholesky step", file=sys.stderr)


if __name__ == "__main__":
    main()
