"""Golden tests for pyramid/gradient/interpolation ops.

Hand-computed tiny matrices pin down the reference's exact integer semantics
(truncating division, u8/u16/i16 dtypes, odd row/col dropping) and the
bilinear interpolation domain.
"""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.ops import gradient, interp, pyramid


# --- mean pyramid ----------------------------------------------------------


def test_mean_pyramid_exact_2x2_mean():
    img = jnp.array(
        [
            [0, 1, 2, 3],
            [4, 5, 6, 7],
            [8, 9, 10, 11],
            [12, 13, 14, 15],
        ],
        dtype=jnp.uint8,
    )
    pyr = pyramid.mean_pyramid(3, img)
    assert len(pyr) == 3
    # blocks: [[0,1],[4,5]] -> 10//4=2 ; [[2,3],[6,7]] -> 18//4=4
    np.testing.assert_array_equal(np.asarray(pyr[1]), [[2, 4], [10, 12]])
    np.testing.assert_array_equal(np.asarray(pyr[2]), [[(2 + 4 + 10 + 12) // 4]])


def test_mean_pyramid_truncates_not_rounds():
    img = jnp.array([[1, 1], [1, 2]], dtype=jnp.uint8)  # sum 5 -> 5//4 = 1
    pyr = pyramid.mean_pyramid(2, img)
    np.testing.assert_array_equal(np.asarray(pyr[1]), [[1]])


def test_mean_pyramid_odd_dims_drop_last():
    img = jnp.arange(5 * 7, dtype=jnp.uint8).reshape(5, 7)
    pyr = pyramid.mean_pyramid(4, img)
    assert pyr[1].shape == (2, 3)
    assert pyr[2].shape == (1, 1)
    assert len(pyr) == 3  # cannot halve (1, 1)


def test_mean_pyramid_no_overflow():
    img = jnp.full((4, 4), 255, dtype=jnp.uint8)
    pyr = pyramid.mean_pyramid(2, img)
    np.testing.assert_array_equal(np.asarray(pyr[1]), np.full((2, 2), 255))


def test_limited_sequence_cap():
    img = jnp.zeros((64, 64), jnp.uint8)
    assert len(pyramid.mean_pyramid(3, img)) == 3
    assert len(pyramid.mean_pyramid(10, img)) == 7  # 64 -> 1, then stop


# --- gradients -------------------------------------------------------------


def test_centered_gradient_golden():
    img = jnp.array(
        [
            [0, 0, 0, 0],
            [0, 10, 20, 0],
            [0, 30, 40, 0],
            [0, 0, 0, 0],
        ],
        dtype=jnp.uint8,
    )
    gx, gy = gradient.centered(img)
    assert gx.dtype == jnp.int16
    # gx(1,1) = (img(1,2) - img(1,0))/2 = (20 - 0)/2 = 10
    assert int(gx[1, 1]) == 10
    # gx(1,2) = (img(1,3) - img(1,1))/2 = (0 - 10)/2 = -5
    assert int(gx[1, 2]) == -5
    # gy(1,1) = (img(2,1) - img(0,1))/2 = (30 - 0)/2 = 15
    assert int(gy[1, 1]) == 15
    # borders zero
    assert int(gx[0, 1]) == 0 and int(gy[3, 2]) == 0 and int(gx[1, 0]) == 0


def test_trunc_division_matches_rust():
    # (0 - 9) / 2 must be -4 (Rust trunc), not -5 (python floor).
    img = jnp.array(
        [
            [0, 0, 0, 0],
            [9, 9, 0, 0],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
        ],
        dtype=jnp.uint8,
    )
    gx, _ = gradient.centered(img)
    assert int(gx[1, 1]) == (0 - 9) // 2 + 1  # -4, trunc toward zero
    _, gy = gradient.centered(img.T)
    assert int(gy[1, 1]) == -4


def test_squared_norm():
    gx = jnp.array([[3, -2]], jnp.int16)
    gy = jnp.array([[4, 2]], jnp.int16)
    np.testing.assert_array_equal(
        np.asarray(gradient.squared_norm(gx, gy)), [[25, 8]]
    )
    assert gradient.squared_norm(gx, gy).dtype == jnp.uint16


def test_bloc_gradients_golden():
    # block [[a,c],[b,d]] = [[1, 5], [3, 11]]
    a = jnp.array([[1]], jnp.uint8)
    b = jnp.array([[3]], jnp.uint8)
    c = jnp.array([[5]], jnp.uint8)
    d = jnp.array([[11]], jnp.uint8)
    assert int(gradient.bloc_x(a, b, c, d)[0, 0]) == (5 + 11 - 1 - 3) // 2  # 6
    assert int(gradient.bloc_y(a, b, c, d)[0, 0]) == (3 - 1 + 11 - 5) // 2  # 4
    dx, dy = 12, 8
    assert int(gradient.bloc_squared_norm(a, b, c, d)[0, 0]) == (dx * dx + dy * dy) // 4


def test_bloc_x_negative_truncation():
    # c + d - a - b = -9 -> -9 trunc-div 2 = -4
    a = jnp.array([[9]], jnp.uint8)
    b = jnp.array([[0]], jnp.uint8)
    c = jnp.array([[0]], jnp.uint8)
    d = jnp.array([[0]], jnp.uint8)
    assert int(gradient.bloc_x(a, b, c, d)[0, 0]) == -4


def test_gradients_pyramid_shapes():
    pyr = pyramid.mean_pyramid(4, jnp.zeros((32, 48), jnp.uint8))
    grads = gradient.gradients_xy(pyr)
    assert len(grads) == 3
    assert grads[0][0].shape == (16, 24)
    sqn = gradient.gradients_squared_norm(pyr)
    assert [g.shape for g in sqn] == [(16, 24), (8, 12), (4, 6)]


def test_squared_norm_direct_matches_components():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (16, 16), dtype=np.uint8))
    direct = gradient.squared_norm_direct(img)
    # direct divides (2gx)^2+(2gy)^2 by 4 BEFORE the per-component halving,
    # so it differs from squared_norm(centered) only by truncation effects.
    gx, gy = gradient.centered(img)
    sn = gradient.squared_norm(gx, gy)
    diff = np.abs(direct.astype(np.int32) - np.asarray(sn).astype(np.int32))
    # halving first loses at most 1 per component: bound the difference
    assert diff.max() <= 2 * (np.abs(np.asarray(gx)).max() + np.abs(np.asarray(gy)).max()) + 1


# --- bilinear interpolation --------------------------------------------------


def _ref_bilinear(img, x, y):
    """Straight port of the reference's scalar interpolate for testing."""
    h, w = img.shape
    u, v = np.floor(x), np.floor(y)
    if u >= 0 and u < w - 2 and v >= 0 and v < h - 2:
        u0, v0 = int(u), int(v)
        a, b = x - u, y - v
        return (
            (1 - b) * (1 - a) * img[v0, u0]
            + b * (1 - a) * img[v0 + 1, u0]
            + (1 - b) * a * img[v0, u0 + 1]
            + b * a * img[v0 + 1, u0 + 1]
        )
    return None


def test_bilinear_matches_reference_scalar():
    rng = np.random.default_rng(1)
    img_np = rng.integers(0, 256, (12, 10), dtype=np.uint8)
    img = jnp.asarray(img_np)
    xs = rng.uniform(-2, 12, 200)
    ys = rng.uniform(-2, 14, 200)
    for method in ("gather", "onehot"):
        vals, mask = interp.bilinear(img, jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32), method)
        vals, mask = np.asarray(vals), np.asarray(mask)
        for i in range(len(xs)):
            ref = _ref_bilinear(img_np.astype(np.float64), np.float32(xs[i]), np.float32(ys[i]))
            if ref is None:
                assert not mask[i], (method, i, xs[i], ys[i])
            else:
                assert mask[i], (method, i, xs[i], ys[i])
                np.testing.assert_allclose(vals[i], ref, rtol=1e-5, atol=1e-3)


def test_bilinear_domain_boundaries():
    img = jnp.zeros((8, 8), jnp.uint8)
    # floor(x) must be < w-2 = 6: x = 5.999 in, x = 6.0 out
    _, m = interp.bilinear_gather(img, jnp.array([5.999, 6.0, -0.001, 0.0]), jnp.array([0.0, 0.0, 0.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(m), [True, False, False, True])


def test_bilinear_exact_on_integers():
    img = jnp.asarray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    x = jnp.array([2.0, 3.0], jnp.float32)
    y = jnp.array([1.0, 4.0], jnp.float32)
    vals, mask = interp.bilinear_gather(img, x, y)
    np.testing.assert_array_equal(np.asarray(vals), [8 * 1 + 2, 8 * 4 + 3])


def test_bilinear_onehot_wide_integer_exact():
    """u16/i32 images must NOT take the bf16 path (values > 255 round in
    bf16); onehot must match gather exactly for wide integers."""
    import jax
    from visual_odometry_rs_tpu.ops import interp

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 65536, size=(32, 48)), jnp.uint16)
    x = jnp.asarray(rng.uniform(1, 45, 128), jnp.float32)
    y = jnp.asarray(rng.uniform(1, 29, 128), jnp.float32)
    v1, m1 = interp.bilinear_gather(img, x, y)
    v2, m2 = interp.bilinear_onehot(img, x, y)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-6)
