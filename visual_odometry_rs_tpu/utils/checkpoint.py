"""Checkpoint / resume of tracker state (SURVEY §5).

The reference keeps tracker state in memory only; its de-facto checkpoint is
the stdout trajectory stream.  Here the tracker state is a small pytree
(keyframe data + poses + timestamps), so checkpointing is a generic
pytree↔npz round-trip — no external dependency, resumable mid-sequence, and
the same mechanism serializes the batched ``parallel.batch.TrackState``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    """Serialize an arbitrary pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)
    # treedef is reconstructed by the caller supplying a template tree


def load_pytree(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore a pytree saved by ``save_pytree`` using ``template``'s
    structure (shapes/dtypes are taken from the file)."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    restored = [jnp.asarray(r) for r in restored]
    return jax.tree_util.tree_unflatten(treedef, restored), meta


def save_tracker(path: str, tracker) -> None:
    """Checkpoint a ``models.tracker.Tracker``'s resumable state."""
    state = {
        "keyframe_data": tracker.keyframe_data,
        "keyframe_pose": tracker.keyframe_pose,
        "current_pose": tracker.current_pose,
    }
    meta = {
        "keyframe_depth_timestamp": tracker.keyframe_depth_timestamp,
        "keyframe_img_timestamp": tracker.keyframe_img_timestamp,
        "current_depth_timestamp": tracker.current_depth_timestamp,
        "current_img_timestamp": tracker.current_img_timestamp,
        "keyframe_switches": tracker.keyframe_switches,
    }
    save_pytree(path, state, meta)


def load_tracker(path: str, tracker) -> None:
    """Restore state saved by ``save_tracker`` into an initialized tracker
    with the same configuration."""
    template = {
        "keyframe_data": tracker.keyframe_data,
        "keyframe_pose": tracker.keyframe_pose,
        "current_pose": tracker.current_pose,
    }
    state, meta = load_pytree(path, template)
    tracker.keyframe_data = state["keyframe_data"]
    tracker.keyframe_pose = state["keyframe_pose"]
    tracker.current_pose = state["current_pose"]
    tracker.keyframe_depth_timestamp = meta["keyframe_depth_timestamp"]
    tracker.keyframe_img_timestamp = meta["keyframe_img_timestamp"]
    tracker.current_depth_timestamp = meta["current_depth_timestamp"]
    tracker.current_img_timestamp = meta["current_img_timestamp"]
    tracker.keyframe_switches = meta["keyframe_switches"]
