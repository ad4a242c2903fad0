"""Checkpoint / resume of tracker state (SURVEY §5).

The reference keeps tracker state in memory only; its de-facto checkpoint is
the stdout trajectory stream.  Here the tracker state is a small pytree
(keyframe data + poses + timestamps), so checkpointing is a generic
pytree↔npz round-trip — no external dependency, resumable mid-sequence, and
the same mechanism serializes the batched ``parallel.batch.TrackState``.

Checkpoints embed a format version and a tracker-config fingerprint;
``load_tracker`` refuses a checkpoint whose config doesn't match the live
tracker (a shape-compatible but semantically different config — e.g. changed
LM constants or interp method — would otherwise silently resume with stale
semantics).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any, Tuple

import jax
import numpy as np

FORMAT_VERSION = 2


class CheckpointMismatchError(RuntimeError):
    """Checkpoint is from a different format version or tracker config."""


def config_fingerprint(config, intrinsics=None) -> str:
    """Stable hash of the tracker configuration (+ optional intrinsics)."""
    payload = {"config": dataclasses.asdict(config)}
    if intrinsics is not None:
        payload["intrinsics"] = [
            float(np.asarray(v)) for v in (intrinsics.cx, intrinsics.cy,
                                           intrinsics.fx, intrinsics.fy,
                                           intrinsics.skew)
        ]
    blob = json.dumps(payload, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    """Serialize an arbitrary pytree of arrays to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    meta = dict(meta or {})
    meta.setdefault("format_version", FORMAT_VERSION)
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
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
        "format_version": FORMAT_VERSION,
        "config_fingerprint": config_fingerprint(tracker.config, tracker.intrinsics),
        "keyframe_depth_timestamp": tracker.keyframe_depth_timestamp,
        "keyframe_img_timestamp": tracker.keyframe_img_timestamp,
        "current_depth_timestamp": tracker.current_depth_timestamp,
        "current_img_timestamp": tracker.current_img_timestamp,
        "keyframe_switches": tracker.keyframe_switches,
    }
    save_pytree(path, state, meta)


def load_tracker(path: str, tracker) -> None:
    """Restore state saved by ``save_tracker`` into an initialized tracker
    with the same configuration.

    Raises ``CheckpointMismatchError`` if the checkpoint was written by a
    different format version or a tracker with a different config/intrinsics
    fingerprint.
    """
    template = {
        "keyframe_data": tracker.keyframe_data,
        "keyframe_pose": tracker.keyframe_pose,
        "current_pose": tracker.current_pose,
    }
    state, meta = load_pytree(path, template)
    version = meta.get("format_version")
    if version != FORMAT_VERSION:
        raise CheckpointMismatchError(
            f"checkpoint format version {version!r} != supported {FORMAT_VERSION} "
            f"({path})"
        )
    expected = config_fingerprint(tracker.config, tracker.intrinsics)
    found = meta.get("config_fingerprint")
    if found != expected:
        raise CheckpointMismatchError(
            f"checkpoint config fingerprint {found!r} does not match the live "
            f"tracker's {expected!r} — refusing to resume with mismatched "
            f"tracker semantics ({path})"
        )
    tracker.keyframe_data = state["keyframe_data"]
    tracker.keyframe_pose = state["keyframe_pose"]
    tracker.current_pose = state["current_pose"]
    tracker.keyframe_depth_timestamp = meta["keyframe_depth_timestamp"]
    tracker.keyframe_img_timestamp = meta["keyframe_img_timestamp"]
    tracker.current_depth_timestamp = meta["current_depth_timestamp"]
    tracker.current_img_timestamp = meta["current_img_timestamp"]
    tracker.keyframe_switches = meta["keyframe_switches"]
