"""DSO-selector equivalence tests against the scalar oracle.

``tests/oracle/dso_oracle.py`` transliterates ``dso.rs:98-325`` per pixel.
These tests assert the vectorized production selector produces IDENTICAL
masks on unique-valued gradient inputs (sidestepping the reference's
unspecified tie order), for several shapes including non-multiple-of-32
edges, and through the recursive block-size adaptation.

Input construction: realistic squared-norm gradients are scaled by 4096 and
dithered with a per-pixel offset in [0, 4096) that is unique within any
64x64 window, so every block-max comparison is tie-free while the
pick-vs-threshold structure stays realistic (the region coefficient a is set
to 1/4096 — an exact power of two — to undo the scale inside the quadratic
threshold).  All intermediate f32 quantities stay below 2^24, so both sides
compute bit-identical thresholds.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oracle import dso_oracle
from visual_odometry_rs_tpu.core.candidates import dso
from visual_odometry_rs_tpu.ops import gradient as gradient_ops

SCALE = 4096


def _unique_gradients(h: int, w: int, seed: int) -> np.ndarray:
    """Tie-free, realistically-distributed gradient magnitudes.

    Mostly-smooth image (small median squared-norm, like real scenes) with
    sparse high-contrast patches (strong edges).  The DSO threshold is
    quadratic in the region median, so the median must stay small for any
    pick to clear it — exactly like real imagery."""
    rng = np.random.default_rng(seed)
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = 128 + 8 * np.sin(ii / 9.0) + 7 * np.cos(jj / 11.0)
    for _ in range(max(20, h * w // 400)):
        pi, pj = rng.integers(1, h - 7), rng.integers(1, w - 7)
        img[pi : pi + 6, pj : pj + 6] += rng.choice([-80, 80])
    img = np.clip(img, 0, 255).astype(np.uint8)
    gx, gy = np.asarray(gradient_ops.centered(jnp.asarray(img)))
    g = np.clip(gx.astype(np.int64) ** 2 + gy.astype(np.int64) ** 2, 0, 455)
    # dither in [0, 4096): unique within any 64x64 window -> no block-max
    # ties; g*4096 + dither stays < 2^24/9 so all f32 sums are exact
    dither = (ii % 64) * 64 + (jj % 64)
    return (g * SCALE + dither).astype(np.int64)


def _raw_pick_count(g: np.ndarray, base_size: int = 4) -> int:
    """Pick count at the given block size, bypassing recursion/thinning."""
    med = dso_oracle.region_median_gradients(g, REGION["size"])
    thr = dso_oracle.region_thresholds(med, REGION["coef_a"], REGION["coef_b"])
    vec_nb, _ = dso_oracle.pick_all_block_candidates(
        dso_oracle.BlockConfig(base_size=base_size), REGION["size"], thr, g
    )
    return sum(vec_nb)


REGION = dict(size=32, coef_a=1.0 / SCALE, coef_b=3)


@pytest.mark.parametrize("shape", [(96, 128), (94, 121), (64, 80)])
def test_oracle_dso_stages_match(shape):
    """Medians, thresholds and block maxima agree exactly (incl. ragged
    right/bottom regions, dso.rs:307-325)."""
    g = _unique_gradients(*shape, seed=shape[0])
    jg = jnp.asarray(g, jnp.int32)

    med_o = dso_oracle.region_median_gradients(g, 32)
    med_j = np.asarray(dso.region_median_gradients(jg, 32))
    np.testing.assert_array_equal(med_o, med_j)

    thr_o = dso_oracle.region_thresholds(med_o, REGION["coef_a"], REGION["coef_b"])
    thr_j = np.asarray(
        dso.region_thresholds(jnp.asarray(med_j), REGION["coef_a"], REGION["coef_b"])
    )
    np.testing.assert_array_equal(thr_o, thr_j)

    for block_size in (4, 6):
        mg_o = dso_oracle.init_max_gradients(g, block_size)
        val_j, pi_j, pj_j = dso._block_max(jg, block_size)
        val_o = np.array([[c[0] for c in row] for row in mg_o])
        pi_o = np.array([[c[1] for c in row] for row in mg_o])
        pj_o = np.array([[c[2] for c in row] for row in mg_o])
        np.testing.assert_array_equal(val_o, np.asarray(val_j))
        np.testing.assert_array_equal(pi_o, np.asarray(pi_j))
        np.testing.assert_array_equal(pj_o, np.asarray(pj_j))


def _oracle_select(g, nb_target, base_size=4):
    return dso_oracle.select(
        g,
        dso_oracle.RegionConfig(**REGION),
        dso_oracle.BlockConfig(base_size=base_size),
        dso_oracle.RecursiveConfig(),
        nb_target,
    )


def _production_select(g, nb_target, base_size=4):
    return np.asarray(
        dso.select(
            jnp.asarray(g, jnp.int32),
            nb_target,
            region_config=dso.RegionConfig(
                size=REGION["size"],
                threshold_coef_a=REGION["coef_a"],
                threshold_coef_b=REGION["coef_b"],
            ),
            block_config=dso.BlockConfig(base_size=base_size),
        )
    )


@pytest.mark.parametrize("shape", [(96, 128), (94, 121)])
def test_oracle_dso_composed_selection_no_recursion(shape):
    """Full composed selection at ratio ≈ 1 (no recursion, no thinning)."""
    g = _unique_gradients(*shape, seed=11)
    count = _raw_pick_count(g)
    assert count > 30, "scenario must pick a meaningful number of candidates"
    res = _oracle_select(g, nb_target=count)
    assert not res.needs_random_thinning
    assert res.final_block_size == 4  # in [0.8, 1.1] → direct mask
    mask = _production_select(g, nb_target=count)
    np.testing.assert_array_equal(mask, res.mask)


def test_oracle_dso_composed_selection_with_recursion():
    """Recursion to a different block size (dso.rs:128-139) agrees, including
    the f32 target-size arithmetic."""
    g = _unique_gradients(96, 128, seed=7)
    count = _raw_pick_count(g)
    tried = 0
    for factor in (6, 8, 10, 12, 5):
        nb_target = max(1, count // factor)  # ratio > 4 → adapt block size up
        res = _oracle_select(g, nb_target=nb_target)
        if res.needs_random_thinning:
            continue  # post-recursion ratio fell in the thread_rng zone
        assert res.final_block_size != 4, "recursion should have changed size"
        mask = _production_select(g, nb_target=nb_target)
        np.testing.assert_array_equal(mask, res.mask)
        tried += 1
    assert tried >= 1, "no deterministic recursion scenario found"


def test_oracle_dso_composed_selection_low_ratio():
    """ratio < 0.8 → recursion toward smaller blocks (more candidates)."""
    g = _unique_gradients(96, 128, seed=13)
    count = _raw_pick_count(g)
    tried = 0
    for factor in (3, 4, 5):
        nb_target = count * factor
        res = _oracle_select(g, nb_target=nb_target)
        if res.needs_random_thinning:
            continue
        mask = _production_select(g, nb_target=nb_target)
        np.testing.assert_array_equal(mask, res.mask)
        tried += 1
    assert tried >= 1, "no deterministic low-ratio scenario found"
