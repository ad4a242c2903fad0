"""DSO candidate-selection tests (ref src/core/candidates/dso.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visual_odometry_rs_tpu.core.candidates import dso
from visual_odometry_rs_tpu.ops import gradient, pyramid


def _gradients(h, w, seed=0):
    """Gradient *norm* (not squared), like the reference's DSO example
    (candidates_dso.rs:42): sqrt(squared_norm_direct) as u16."""
    rng = np.random.default_rng(seed)
    # smooth-ish image: random blobs, so gradients have spatial structure
    base = rng.integers(0, 256, (h // 8, w // 8), np.uint8)
    img = np.kron(base, np.ones((8, 8), np.uint8))
    img = jnp.asarray(img + rng.integers(0, 16, (h, w)).astype(np.uint8))
    return gradient.norm_direct(img)


def test_region_median_exact():
    g = jnp.asarray(np.arange(64).reshape(8, 8), jnp.uint16)
    med = dso.region_median_gradients(g, 4)
    assert med.shape == (2, 2)
    # region (0,0) is values [0..3,8..11,16..19,24..27]; sorted[16//2]=sorted[8]
    region = np.sort(np.asarray(g)[:4, :4].ravel())
    assert int(med[0, 0]) == region[8]


def test_region_median_edge_regions():
    # 10x10 with size 4 -> 3x3 regions, edge regions are 4x2 / 2x4 / 2x2
    rng = np.random.default_rng(1)
    g_np = rng.integers(0, 1000, (10, 10)).astype(np.uint16)
    med = dso.region_median_gradients(jnp.asarray(g_np), 4)
    assert med.shape == (3, 3)
    corner = np.sort(g_np[8:10, 8:10].ravel())
    assert int(med[2, 2]) == corner[4 // 2]


def test_region_thresholds_formula():
    med = jnp.asarray([[4, 8], [12, 16]], jnp.uint16)
    th = dso.region_thresholds(med, 1.0, 3)
    # corner (0,0): mean of 4 neighbors (4+8+12+16)/4 = 10 -> (10+3)^2 = 169
    assert int(th[0, 0]) == 169


def test_select_reaches_target_count():
    g = _gradients(128, 160, seed=2)
    for target in (200, 800):
        mask = dso.select(g, target)
        count = int(jnp.sum(mask))
        # within the recursive config's acceptance band (or best effort)
        assert 0.3 * target < count < 4.5 * target, (target, count)


def test_select_deterministic():
    g = _gradients(96, 96, seed=3)
    import jax

    m1 = dso.select(g, 300, key=jax.random.PRNGKey(7))
    m2 = dso.select(g, 300, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_picked_points_have_high_gradients():
    g = _gradients(128, 128, seed=4)
    mask = dso.select(g, 400)
    g_np = np.asarray(g).astype(np.float64)
    m = np.asarray(mask)
    assert m.any()
    # picked pixels should have a much higher mean gradient than average
    assert g_np[m].mean() > 1.5 * g_np.mean()


def test_block_max_positions():
    g = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8], [9, 1, 1, 1], [1, 1, 1, 20]], jnp.uint16)
    val, pi, pj = dso._block_max(g, 2)
    assert int(val[0, 0]) == 6 and (int(pi[0, 0]), int(pj[0, 0])) == (1, 1)
    assert int(val[1, 1]) == 20 and (int(pi[1, 1]), int(pj[1, 1])) == (3, 3)


def test_well_distributed():
    # selection must spread across the image, not cluster in one quadrant
    g = _gradients(128, 128, seed=5)
    mask = np.asarray(dso.select(g, 400))
    h, w = mask.shape
    quadrants = [
        mask[: h // 2, : w // 2].sum(),
        mask[: h // 2, w // 2 :].sum(),
        mask[h // 2 :, : w // 2].sum(),
        mask[h // 2 :, w // 2 :].sum(),
    ]
    assert min(quadrants) > 0.1 * max(quadrants), quadrants


def test_select_fixed_block_matches_host_select():
    """The recursion-free in-graph selector equals the host ``select`` at
    the same block size whenever the recursion does not fire — across
    thinning (ratio > 1.1) and no-thinning targets, same key."""
    import jax

    g = _gradients(128, 160, seed=5)
    key = jax.random.PRNGKey(3)
    norec = dso.RecursiveConfig(nb_iterations_left=0)
    for target in (100, 500, 2000, 20000):
        want = dso.select(g, target, recursive_config=norec, key=key)
        got = dso.select_fixed_block(g, target, block_size=4, key=key)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=str(target)
        )


def test_select_fixed_block_is_jittable():
    """The whole fixed-block selection runs under jit (the property that
    makes candidate_selector='dso_fixed' available to the fused drivers)."""
    import jax

    g = _gradients(96, 128, seed=6)
    fn = jax.jit(
        lambda g: dso.select_fixed_block(g, 600, block_size=4)
    )
    m1 = fn(g)
    m2 = dso.select_fixed_block(g, 600, block_size=4)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert int(jnp.sum(m1)) > 0
