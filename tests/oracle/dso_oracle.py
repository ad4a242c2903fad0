"""Scalar oracle of the reference DSO candidate selector — TEST CODE ONLY.

A per-pixel transliteration of ``/root/reference/src/core/candidates/dso.rs``
(region medians :307-325, smoothed quadratic thresholds :284-303, multi-level
block picking :154-276, recursive block-size adaptation :98-147), used as an
executable oracle by ``tests/test_oracle_dso.py`` to check the vectorized
production implementation (``visual_odometry_rs_tpu/core/candidates/dso.py``)
on the *composed* selection, not just per-stage properties.

Faithfulness notes:

- Block-max scan order is column-major within each block with a strict ``>``
  (dso.rs:212-218), so ties keep the first pixel in column-major order.  The
  production argmax is row-major-first.  Both are valid (the reference's
  iteration order is an implementation detail); equivalence tests therefore
  use unique-valued gradient inputs.
- ``region_thresholds`` sums medians in the gradient's integer type
  (dso.rs:291-295), which for u16 could wrap above 65535 in release Rust.
  The oracle sums in exact integers (like the f32-conv production path);
  realistic gradient medians are far below the wrap point.
- Ratio / target-size math is f32 with Rust's round-half-away-from-zero
  (dso.rs:117-125).
- The random-thinning branch (dso.rs:140-143, ``thread_rng`` —
  nondeterministic in the reference) is reported via a flag instead of
  emulated; equivalence tests choose targets that avoid it.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

F = np.float32


class RegionConfig(NamedTuple):
    size: int = 32
    coef_a: float = 1.0
    coef_b: int = 3


class BlockConfig(NamedTuple):
    base_size: int = 4
    nb_levels: int = 3
    threshold_factor: float = 0.5


class RecursiveConfig(NamedTuple):
    nb_iterations_left: int = 1
    low_thresh: float = 0.8
    high_thresh: float = 4.0
    random_thresh: float = 1.1


def _ceil_div(a: int, b: int) -> int:
    q, r = divmod(a, b)
    return q if r == 0 else q + 1


def region_median_gradients(gradients: np.ndarray, size: int) -> np.ndarray:
    """dso.rs:307-325: per-region upper median (sorted[len/2]); right/bottom
    regions may be smaller."""
    h, w = gradients.shape
    nr, nc = _ceil_div(h, size), _ceil_div(w, size)
    out = np.zeros((nr, nc), gradients.dtype)
    for i in range(nr):
        for j in range(nc):
            hh = min(size, h - i * size)
            ww = min(size, w - j * size)
            vals = sorted(gradients[i * size : i * size + hh, j * size : j * size + ww].ravel())
            out[i, j] = vals[len(vals) // 2]
    return out


def region_thresholds(medians: np.ndarray, coef_a: float, coef_b: int) -> np.ndarray:
    """dso.rs:284-303: threshold = a * (mean3x3(median) + b)^2, truncated to
    the integer gradient type."""
    nr, nc = medians.shape
    out = np.zeros((nr, nc), np.int64)
    for i in range(nr):
        for j in range(nc):
            si, sj = max(0, i - 1), max(0, j - 1)
            ei, ej = min(nr, i + 2), min(nc, j + 2)
            block = medians[si:ei, sj:ej]
            s = int(block.sum(dtype=np.int64))
            n = block.size
            t = F(F(F(s) / F(n)) + F(coef_b))
            # Rust: a * t * t (left-assoc f32), then integer cast truncates
            out[i, j] = int(F(F(F(coef_a) * t) * t))
    return out


def init_max_gradients(gradients: np.ndarray, block_size: int):
    """dso.rs:193-222: (max value, abs i, abs j) per block; column-major scan
    within each block, strict > keeps first occurrence."""
    h, w = gradients.shape
    nr, nc = _ceil_div(h, block_size), _ceil_div(w, block_size)
    out = [[None] * nc for _ in range(nr)]
    for bi in range(nr):
        for bj in range(nc):
            si, sj = bi * block_size, bj * block_size
            ei, ej = min(si + block_size, h), min(sj + block_size, w)
            best = (int(gradients[si, sj]), si, sj)
            for j in range(sj, ej):
                for i in range(si, ei):
                    g = int(gradients[i, j])
                    if g > best[0]:
                        best = (g, i, j)
            out[bi][bj] = best
    return out


def _g_max(m1, m2):
    """dso.rs:231-237: m2 iff m1.val < m2.val (ties keep m1)."""
    return m2 if m1[0] < m2[0] else m1


def halve_max(m):
    """multires::halve with max_of_four_gradients (dso.rs:164-167, 225-239):
    corner preference chain g_max(a, g_max(b, g_max(c, d)))."""
    nr, nc = len(m), len(m[0])
    h2, w2 = nr // 2, nc // 2
    if h2 == 0 or w2 == 0:
        return None
    out = [[None] * w2 for _ in range(h2)]
    for i in range(h2):
        for j in range(w2):
            a = m[2 * i][2 * j]
            b = m[2 * i + 1][2 * j]
            c = m[2 * i][2 * j + 1]
            d = m[2 * i + 1][2 * j + 1]
            out[i][j] = _g_max(a, _g_max(b, _g_max(c, d)))
    return out


def pick_level_block_candidates(
    threshold_level_coef: float,
    level: int,
    regions_size: int,
    regions_thresholds: np.ndarray,
    max_gradients,
    mask: np.ndarray,
    candidates: np.ndarray,
):
    """dso.rs:246-276."""
    mh, mw = mask.shape
    mask_next = np.ones((mh // 2, mw // 2), bool)
    nb_picked = 0
    for j in range(mw // 2 * 2):
        for i in range(mh // 2 * 2):
            if mask[i, j]:
                g2, i_g, j_g = max_gradients[i][j]
                threshold = regions_thresholds[i_g // regions_size, j_g // regions_size]
                if F(g2) >= F(F(threshold_level_coef) * F(threshold)):
                    mask_next[i // 2, j // 2] = False
                    candidates[i_g, j_g] = level
                    nb_picked += 1
            else:
                mask_next[i // 2, j // 2] = False
    return nb_picked, mask_next, candidates


def pick_all_block_candidates(
    block_config: BlockConfig,
    regions_size: int,
    regions_thresholds: np.ndarray,
    gradients: np.ndarray,
) -> Tuple[List[int], np.ndarray]:
    """dso.rs:156-190."""
    h, w = gradients.shape
    maxg = [init_max_gradients(gradients, block_config.base_size)]
    while len(maxg) < block_config.nb_levels:
        nxt = halve_max(maxg[-1])
        if nxt is None:
            break
        maxg.append(nxt)
    coef = 1.0
    nb_picked = []
    mask = np.ones((len(maxg[0]), len(maxg[0][0])), bool)
    candidates = np.zeros((h, w), np.uint8)
    for level, mg in enumerate(maxg):
        n, mask, candidates = pick_level_block_candidates(
            coef, level + 1, regions_size, regions_thresholds, mg, mask, candidates
        )
        nb_picked.append(n)
        coef *= block_config.threshold_factor
    return nb_picked, candidates


class SelectResult(NamedTuple):
    mask: np.ndarray  # picked > 0
    needs_random_thinning: bool  # reference would thread_rng-thin (dso.rs:140-143)
    ratio: float
    final_block_size: int


def select(
    gradients: np.ndarray,
    region_config: RegionConfig,
    block_config: BlockConfig,
    recursive_config: RecursiveConfig,
    nb_target: int,
) -> SelectResult:
    """dso.rs:98-147 (the random branch is flagged, not emulated)."""
    medians = region_median_gradients(gradients, region_config.size)
    thresholds = region_thresholds(medians, region_config.coef_a, region_config.coef_b)
    vec_nb, picked = pick_all_block_candidates(
        block_config, region_config.size, thresholds, gradients
    )
    nb_candidates = sum(vec_nb)
    ratio = F(F(nb_candidates) / F(nb_target))
    # target_size = round(sqrt(ratio) * (base + 1) - 1), round half away from 0
    ts = F(F(F(np.sqrt(ratio)) * F(block_config.base_size + 1)) - F(1.0))
    target_size = max(1, int(np.floor(ts + F(0.5))) if ts >= 0 else -int(np.floor(-ts + F(0.5))))
    if ratio < F(recursive_config.low_thresh) or ratio > F(recursive_config.high_thresh):
        if target_size != block_config.base_size and recursive_config.nb_iterations_left > 0:
            return select(
                gradients,
                region_config,
                block_config._replace(base_size=target_size),
                recursive_config._replace(
                    nb_iterations_left=recursive_config.nb_iterations_left - 1
                ),
                nb_target,
            )
        return SelectResult(picked > 0, False, float(ratio), block_config.base_size)
    if ratio > F(recursive_config.random_thresh):
        return SelectResult(picked > 0, True, float(ratio), block_config.base_size)
    return SelectResult(picked > 0, False, float(ratio), block_config.base_size)
