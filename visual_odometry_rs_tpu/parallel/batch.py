"""Batched, fully-fused, shardable multi-sequence tracking.

The reference tracks one sequence on one core with host-side keyframe
switching (``vors_track.rs:49-64``).  This module is the TPU scaling path:

- ``track_step``: one frame of one sequence as a *pure function* of tracker
  state — pyramid, 6-level LM, flow check and keyframe switch all inside jit.
  The keyframe switch is data-dependent, so under SPMD it is expressed as a
  select over double-buffered keyframe state (recompute-and-select), which is
  the branch-free form ``vmap``/``pjit`` require.
- ``batched_track_step``: ``vmap`` over a batch of sequences (data
  parallelism per chip).
- Sharding: batch-dim ``NamedSharding`` over the ``data`` mesh axis makes the
  same jitted function run SPMD across chips, with XLA inserting collectives
  only where needed (there is no cross-sequence coupling, so DP is
  communication-free; the sharded-reduction TP path lives in
  ``parallel.sharded``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Intrinsics
from ..math import pose as pose_mod
from ..math.pose import Pose
from ..models import tracker as tracker_mod
from ..models.tracker import KeyframeData, TrackerConfig
from ..ops import pyramid as pyramid_ops
from ..utils.types import Float


class TrackState(NamedTuple):
    """Per-sequence tracker state as a pytree (batched with a leading axis)."""

    kf: KeyframeData
    keyframe_pose: Pose
    current_pose: Pose


class StepDiagnostics(NamedTuple):
    flow: jnp.ndarray
    failed: jnp.ndarray
    switched: jnp.ndarray


def init_state(
    config: TrackerConfig, intrinsics: Intrinsics, depth: jnp.ndarray, img: jnp.ndarray
) -> TrackState:
    """Functional ``Config::init`` (inverse_compositional.rs:74-100)."""
    pyr = pyramid_ops.mean_pyramid(config.nb_levels, img)
    kf = tracker_mod.precompute_keyframe(config, intrinsics, depth, pyr)
    return TrackState(
        kf=kf, keyframe_pose=pose_mod.identity(), current_pose=pose_mod.identity()
    )


def track_step(
    config: TrackerConfig,
    intrinsics: Intrinsics,
    state: TrackState,
    depth: jnp.ndarray,
    img: jnp.ndarray,
):
    """One fully-fused tracking step: returns (new_state, diagnostics).

    Mirrors ``Tracker::track`` (inverse_compositional.rs:170-240) but as a
    pure function with the keyframe switch as a masked select, so it vmaps
    and shards.  The keyframe precompute runs every frame under SPMD (both
    branches of a data-dependent switch are materialized); this trades FLOPs
    for branch-free batched execution — the standard TPU divergence tradeoff.
    """
    init_model = pose_mod.compose(pose_mod.inverse(state.current_pose), state.keyframe_pose)
    pyr = pyramid_ops.mean_pyramid(config.nb_levels, img)
    result = tracker_mod.track_frame(config, state.kf, pyr, init_model)

    new_current = jax.tree_util.tree_map(
        lambda ok, old: jnp.where(result.failed, old, ok),
        pose_mod.compose(state.keyframe_pose, pose_mod.inverse(result.model)),
        state.current_pose,
    )

    switch = result.flow >= config.flow_threshold
    new_kf = tracker_mod.precompute_keyframe(config, intrinsics, depth, pyr)
    kf = jax.tree_util.tree_map(
        lambda new, old: jnp.where(switch, new, old), new_kf, state.kf
    )
    keyframe_pose = jax.tree_util.tree_map(
        lambda new, old: jnp.where(switch, new, old), new_current, state.keyframe_pose
    )
    new_state = TrackState(kf=kf, keyframe_pose=keyframe_pose, current_pose=new_current)
    return new_state, StepDiagnostics(flow=result.flow, failed=result.failed, switched=switch)


def batched_init_state(
    config: TrackerConfig, intrinsics: Intrinsics, depths: jnp.ndarray, imgs: jnp.ndarray
) -> TrackState:
    """Initialize a batch of sequences: depths/imgs are (B, H, W)."""
    return jax.vmap(lambda d, i: init_state(config, intrinsics, d, i))(depths, imgs)


def batched_track_step(
    config: TrackerConfig,
    intrinsics: Intrinsics,
    state: TrackState,
    depths: jnp.ndarray,
    imgs: jnp.ndarray,
):
    """vmap of ``track_step`` over the leading batch (sequence) axis."""
    return jax.vmap(
        lambda s, d, i: track_step(config, intrinsics, s, d, i)
    )(state, depths, imgs)


def make_sharded_step(config: TrackerConfig, intrinsics: Intrinsics, mesh, axis="data"):
    """jit the batched step with batch-dim shardings over ``mesh``.

    Inputs and state are sharded on their leading axis over ``axis``; XLA
    compiles one SPMD program per chip with no cross-chip communication
    (sequences are independent).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard_like(tree):
        def spec(x):
            if hasattr(x, "ndim") and x.ndim > 0:
                return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
            return NamedSharding(mesh, P())

        return jax.tree_util.tree_map(spec, tree)

    def step(state, depths, imgs):
        return batched_track_step(config, intrinsics, state, depths, imgs)

    return jax.jit(step)
