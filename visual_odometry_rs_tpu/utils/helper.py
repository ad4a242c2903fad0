"""Small helpers (ref ``src/misc/helper.rs``).

``read_png_16bits`` lives in ``dataset.tum_rgbd`` (where it is used);
this module keeps the generic pieces: ``zip_mask_map`` and ``div_rem``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp


def zip_mask_map(mat: jnp.ndarray, mask: jnp.ndarray, default, f: Callable) -> jnp.ndarray:
    """Apply ``f`` where ``mask`` holds, ``default`` elsewhere
    (ref helper.rs:40-47).  Vectorized: ``f`` maps arrays to arrays."""
    return jnp.where(mask, f(mat), default)


def div_rem(a: int, b: int) -> Tuple[int, int]:
    """Quotient and remainder (ref helper.rs:50-55)."""
    return a // b, a % b
