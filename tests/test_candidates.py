"""Coarse-to-fine candidate-selection tests, cross-checked against a scalar
port of the reference algorithm (ref src/core/candidates/coarse_to_fine.rs)."""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core.candidates import coarse_to_fine
from visual_odometry_rs_tpu.ops import gradient, pyramid


def scalar_prune(thresh, a, b, c, d):
    """Port of prune_with_thresh (coarse_to_fine.rs:73-89); stable sort."""
    temp = sorted([(a, 0), (b, 1), (c, 2), (d, 3)], key=lambda t: t[0])
    result = [False] * 4
    result[temp[3][1]] = True
    if temp[2][0] > temp[1][0] + thresh:
        result[temp[2][1]] = True
    return result


def scalar_select(thresh, gradients):
    """Port of select (coarse_to_fine.rs:15-32)."""
    nrows, ncols = gradients[-1].shape
    masks = [np.ones((nrows, ncols), bool)]
    for grad in reversed(gradients[:-1]):
        pre = masks[-1]
        h, w = grad.shape
        mask = np.zeros((h, w), bool)
        for i in range(h // 2):
            for j in range(w // 2):
                if pre[i, j]:
                    a = grad[2 * i, 2 * j]
                    b = grad[2 * i + 1, 2 * j]
                    c = grad[2 * i, 2 * j + 1]
                    d = grad[2 * i + 1, 2 * j + 1]
                    ok = scalar_prune(thresh, int(a), int(b), int(c), int(d))
                    mask[2 * i, 2 * j] = ok[0]
                    mask[2 * i + 1, 2 * j] = ok[1]
                    mask[2 * i, 2 * j + 1] = ok[2]
                    mask[2 * i + 1, 2 * j + 1] = ok[3]
        masks.append(mask)
    return masks


def _gradient_levels(img, nb_levels):
    pyr = pyramid.mean_pyramid(nb_levels, img)
    return gradient.gradients_squared_norm(pyr)


def test_matches_scalar_reference_unique_values():
    # Distinct gradient values everywhere -> tie-breaking can't differ.
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.permutation(64 * 64).reshape(64, 64) % 256, jnp.uint8)
    grads = _gradient_levels(img, 5)
    # Perturb ties: add a tiny unique offset via int32 before comparing
    grads_np = [np.asarray(g).astype(np.int64) for g in grads]
    grads_unique = []
    for g in grads_np:
        u = g * 16 + (np.arange(g.size).reshape(g.shape) % 16)
        grads_unique.append(u)
    masks_jax = coarse_to_fine.select(7 * 16, [jnp.asarray(g, jnp.int32) for g in grads_unique])
    masks_ref = scalar_select(7 * 16, grads_unique)
    assert len(masks_jax) == len(masks_ref)
    for mj, mr in zip(masks_jax, masks_ref):
        np.testing.assert_array_equal(np.asarray(mj), mr)


def test_count_monotone_and_nonempty():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.integers(0, 256, (128, 128), np.uint8))
    grads = _gradient_levels(img, 5)
    masks = coarse_to_fine.select(7, grads)
    counts = [int(jnp.sum(m)) for m in masks]
    # each finer level selects 1-2 pixels per previously selected pixel
    for coarse, fine in zip(counts[:-1], counts[1:]):
        assert coarse <= fine <= 2 * coarse
    assert counts[0] == masks[0].size  # all-true at coarsest


def test_block_max_always_selected():
    # In every 2x2 block under a selected coarse pixel, the max must be kept.
    g_fine = jnp.asarray([[10, 2, 3, 4], [1, 5, 6, 20], [7, 8, 30, 9], [11, 12, 13, 40]], jnp.int32)
    g_coarse = jnp.asarray([[1, 1], [1, 1]], jnp.int32)
    masks = coarse_to_fine.select(100, [g_fine, g_coarse])
    m = np.asarray(masks[-1])
    assert m[0, 0]  # 10 is max of block [[10,2],[1,5]]
    assert m[1, 3]  # 20 is max of block [[3,4],[6,20]]
    assert m[3, 1]  # 12 is max of block [[7,8],[11,12]]
    assert m[3, 3]  # 40 is max of block [[30,9],[13,40]]
    assert m.sum() == 4  # threshold 100 suppresses all seconds


def test_second_threshold():
    # second > third + thresh -> both kept
    g_fine = jnp.asarray([[0, 1], [8, 9]], jnp.int32)
    g_coarse = jnp.asarray([[1]], jnp.int32)
    masks = coarse_to_fine.select(5, [g_fine, g_coarse])
    m = np.asarray(masks[-1])
    # example from the reference docstring: (0, 1, 8, 9) -> max 9 and second 8
    # kept because 8 > 1 + 5   (a=0, b=8? careful: block order a,b,c,d is
    # column-major: a=(0,0)=0, b=(1,0)=8, c=(0,1)=1, d=(1,1)=9)
    assert m[1, 1] and m[1, 0]
    assert not m[0, 0] and not m[0, 1]

    masks = coarse_to_fine.select(8, [g_fine, g_coarse])
    m = np.asarray(masks[-1])
    assert m[1, 1] and m.sum() == 1  # 8 > 1 + 8 is false


def test_unselected_coarse_blocks_stay_empty():
    g_fine = jnp.asarray(np.arange(16).reshape(4, 4), jnp.int32)
    g_coarse = jnp.asarray([[100, 0], [0, 100]], jnp.int32)
    # run one extra level so the coarse mask is not all-true
    g_coarser = jnp.asarray([[1]], jnp.int32)
    masks = coarse_to_fine.select(1000, [g_fine, g_coarse, g_coarser])
    mid = np.asarray(masks[1])  # mask at g_coarse level: only the max kept
    assert mid.sum() == 1
    fine = np.asarray(masks[2])
    # only the 2x2 block under the single selected coarse pixel has a pick
    assert fine.sum() == 1


def test_select_rolled_matches_corner():
    """The full-resolution partner-swap select (impl="rolled") is
    bit-identical to the corner comparator network across dense ties, odd
    trailing dims, batch axes, and both integer and f32 carriers (the
    retired-variant oracle — see tools/ab_select.py for why it is not the
    default)."""
    import numpy as np

    rng = np.random.default_rng(11)
    cases = [
        ([(37, 53), (18, 26), (9, 13)], None),
        ([(48, 64), (24, 32), (12, 16)], 3),
    ]
    for shapes, batch in cases:
        levels = []
        for s in shapes:
            shape = s if batch is None else (batch, *s)
            levels.append(jnp.asarray(rng.integers(0, 4, shape, np.uint16)))
        for lvls in (levels, [l.astype(jnp.float32) for l in levels]):
            for thresh in (0, 1, 7):
                got = coarse_to_fine.select(thresh, lvls, impl="rolled")
                want = coarse_to_fine.select(thresh, lvls, impl="corner")
                for g, w in zip(got, want):
                    np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
