"""Inverse-depth values with validity states, and 2x2 fusion strategies.

Capability parity with reference ``src/core/inverse_depth.rs``.  The
reference's ``InverseDepth`` enum {Unknown, Discarded, WithVariance(ρ, σ²)}
becomes three dense channels — ``idepth`` (f32), ``variance`` (f32) and a
``state`` code (u8: 0=Unknown, 1=Discarded, 2=WithVariance) — so whole maps
fuse as vectorized masked reductions instead of per-pixel enum matches.

Both merging strategies are implemented:

- ``strategy_dso_mean`` (inverse_depth.rs:81-98): variance acts as a *weight*
  (DSO-style trust); fused value is the weight-weighted mean and weights add.
- ``strategy_statistically_similar`` (inverse_depth.rs:105-152):
  inverse-variance mean with a compatibility gate
  ``(d_i - new_d)^2 < new_v`` for every input, else Discarded; fused variance
  is ``(2/k) * mean(v)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.types import Float
from ..ops.pyramid import block_2x2

UNKNOWN = 0
DISCARDED = 1
WITH_VARIANCE = 2


class InverseDepthMap(NamedTuple):
    """Dense inverse-depth map: value, variance and state channels."""

    idepth: jnp.ndarray  # f32
    variance: jnp.ndarray  # f32
    state: jnp.ndarray  # uint8: UNKNOWN / DISCARDED / WITH_VARIANCE

    @property
    def known(self) -> jnp.ndarray:
        return self.state == WITH_VARIANCE


def from_depth(scale, depth_u16: jnp.ndarray, variance) -> InverseDepthMap:
    """u16 depth map → inverse depth (ref inverse_depth.rs:24-29).

    A raw value of 0 means unknown; otherwise ``idepth = scale / depth``.
    """
    depth = depth_u16.astype(Float)
    known = depth_u16 > 0
    idepth = jnp.where(known, jnp.asarray(scale, Float) / jnp.maximum(depth, 1.0), 0.0)
    var = jnp.where(known, jnp.asarray(variance, Float), 0.0)
    state = jnp.where(known, jnp.uint8(WITH_VARIANCE), jnp.uint8(UNKNOWN))
    return InverseDepthMap(idepth, var, state)


def to_depth(scale, m: InverseDepthMap) -> jnp.ndarray:
    """Inverse depth → u16 depth; Unknown/Discarded encode as 0
    (ref inverse_depth.rs:37-42)."""
    depth = jnp.round(jnp.asarray(scale, Float) / jnp.where(m.known, m.idepth, 1.0))
    return jnp.where(m.known, depth, 0.0).astype(jnp.uint16)


def masked(m: InverseDepthMap, mask: jnp.ndarray) -> InverseDepthMap:
    """Keep values only where ``mask``; elsewhere Unknown.

    The analog of ``helper::zip_mask_map`` applied at candidate selection
    (ref inverse_compositional.rs:129-134).
    """
    keep = jnp.logical_and(mask, m.known)
    return InverseDepthMap(
        jnp.where(keep, m.idepth, 0.0),
        jnp.where(keep, m.variance, 0.0),
        jnp.where(keep, jnp.uint8(WITH_VARIANCE), jnp.uint8(UNKNOWN)),
    )


def _stack_blocks(m: InverseDepthMap):
    """(H, W) channels → per-2x2-block stacks of shape (4, H/2, W/2)."""
    d = jnp.stack(block_2x2(m.idepth))
    v = jnp.stack(block_2x2(m.variance))
    s = jnp.stack(block_2x2(m.state))
    return d, v, s


def fuse_dso_mean(m: InverseDepthMap) -> InverseDepthMap:
    """Halve resolution fusing each 2x2 block with the DSO mean strategy.

    ``new_d = Σ d_i v_i / Σ v_i``, ``new_v = Σ v_i`` over the known values of
    the block; Unknown if no value is known (ref inverse_depth.rs:81-98
    through the ``fuse`` combinator :49-66).
    """
    d, v, s = _stack_blocks(m)
    valid = (s == WITH_VARIANCE).astype(Float)
    vsum = jnp.sum(v * valid, axis=0)
    dsum = jnp.sum(d * v * valid, axis=0)
    count = jnp.sum(valid, axis=0)
    known = count > 0
    new_d = jnp.where(known, dsum / jnp.where(known, vsum, 1.0), 0.0)
    new_v = jnp.where(known, vsum, 0.0)
    state = jnp.where(known, jnp.uint8(WITH_VARIANCE), jnp.uint8(UNKNOWN))
    return InverseDepthMap(new_d, new_v, state)


def fuse_statistically_similar(m: InverseDepthMap) -> InverseDepthMap:
    """Halve resolution with the statistical-compatibility strategy.

    Over the k known values of each block (ref inverse_depth.rs:105-152):
    ``new_d`` = inverse-variance-weighted mean (computed, like the reference,
    via products of the *other* variances), ``new_v = (2/k) * mean(v)``, and
    every input must satisfy ``(d_i - new_d)^2 < new_v`` or the block is
    Discarded.  k = 0 → Unknown; k = 1 → WithVariance(d, 2 v).
    """
    d, v, s = _stack_blocks(m)
    valid = s == WITH_VARIANCE
    validf = valid.astype(Float)
    count = jnp.sum(validf, axis=0)

    # Product of the other valid variances: invalid slots contribute 1.
    v_or_1 = jnp.where(valid, v, 1.0)
    prod_all = jnp.prod(v_or_1, axis=0)
    prod_others = jnp.where(valid, prod_all / jnp.maximum(v_or_1, 1e-38), 0.0)

    denom = jnp.sum(prod_others, axis=0)
    new_d = jnp.sum(d * prod_others, axis=0) / jnp.where(denom > 0, denom, 1.0)

    mean_v = jnp.sum(v * validf, axis=0) / jnp.maximum(count, 1.0)
    new_v = jnp.where(count > 0, (2.0 / jnp.maximum(count, 1.0)) * mean_v, 0.0)

    # Compatibility gate for every known input (skipped when k == 1: the
    # reference's single-value arm has no gate).
    dev_ok = jnp.where(valid, (d - new_d) ** 2 < new_v, True)
    all_ok = jnp.all(dev_ok, axis=0)
    compatible = jnp.logical_or(count <= 1, all_ok)

    known = count > 0
    state = jnp.where(
        known,
        jnp.where(compatible, jnp.uint8(WITH_VARIANCE), jnp.uint8(DISCARDED)),
        jnp.uint8(UNKNOWN),
    )
    keep = state == WITH_VARIANCE
    return InverseDepthMap(
        jnp.where(keep, new_d, 0.0), jnp.where(keep, new_v, 0.0), state
    )


def pyramid(m: InverseDepthMap, nb_levels: int, strategy: str = "dso_mean"):
    """Multi-resolution inverse-depth pyramid (ref inverse_compositional.rs:135-138)."""
    fuse = fuse_dso_mean if strategy == "dso_mean" else fuse_statistically_similar
    levels = [m]
    for _ in range(1, nb_levels):
        h, w = levels[-1].idepth.shape[-2:]
        if h // 2 == 0 or w // 2 == 0:
            break
        levels.append(fuse(levels[-1]))
    return levels
