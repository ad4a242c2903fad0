"""End-to-end pyramidal inverse-compositional affine alignment test.

Asserted version of the reference's self-checking ``optim_affine-2d``
example: the recovered warp must match the ground-truth template warp.
"""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.models import affine2d


def smooth_image(h, w, seed=0):
    """Synthetic smooth test image (low-frequency sinusoid mixture)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w))
    for _ in range(8):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.3, 1.0)
        img += amp * np.sin(2 * np.pi * (fx * xx / w + fy * yy / h) + phase)
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


def test_align_recovers_ground_truth():
    img = smooth_image(128, 160, seed=1)
    template, affine_gt = affine2d.random_template(img, seed=2)
    nb_levels = affine2d.default_nb_levels(*img.shape)
    params, failed = affine2d.align(jnp.asarray(template), jnp.asarray(img), nb_levels)
    assert not bool(failed)
    w = np.asarray(affine2d.warp_matrix(params))[:2, :]
    # linear part tight; translation within a fraction of a pixel
    np.testing.assert_allclose(w[:, :2], affine_gt[:, :2], atol=5e-3)
    np.testing.assert_allclose(w[:, 2], affine_gt[:, 2], atol=0.5)


def test_align_identity():
    img = smooth_image(64, 64, seed=3)
    params, failed = affine2d.align(jnp.asarray(img), jnp.asarray(img), 3)
    assert not bool(failed)
    # aligning an image with itself: warp ≈ identity
    np.testing.assert_allclose(np.asarray(params), np.zeros(6), atol=1e-2)


def test_warp_matrix_roundtrip():
    p = jnp.array([0.1, -0.2, 0.05, 0.02, 3.0, -1.5])
    np.testing.assert_allclose(
        np.asarray(affine2d.warp_params(affine2d.warp_matrix(p))), np.asarray(p), atol=1e-6
    )


def test_default_nb_levels():
    # reference formula: round(1 + log4(npixels/200)) (affine-2d.rs:49-52)
    assert affine2d.default_nb_levels(480, 640) == round(1 + np.log(480 * 640 / 200) / np.log(4))
    assert affine2d.default_nb_levels(10, 10) >= 1


def test_jacobians_shape_and_values():
    gx = jnp.ones((4, 5), jnp.int16) * 2
    gy = jnp.ones((4, 5), jnp.int16) * 3
    jac = affine2d.affine_jacobians(gx, gy)
    assert jac.shape == (20, 6)
    # pixel (y=1, x=2) -> index 1*5+2
    np.testing.assert_array_equal(
        np.asarray(jac[7]), [2 * 2, 2 * 3, 1 * 2, 1 * 3, 2, 3]
    )
