"""Checkpoint/resume and metrics tests (SURVEY §5 subsystems)."""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.utils import checkpoint, metrics


def test_checkpoint_resume_tracker(tmp_path):
    seq = synthetic.generate_sequence(nb_frames=4, height=48, width=64, seed=0)
    config = tracker_mod.TrackerConfig(height=48, width=64, nb_levels=3, candidate_cap=256)

    def new_tracker():
        return tracker_mod.init_tracker(
            config, seq.intrinsics,
            float(seq.timestamps[0]), jnp.asarray(seq.depths[0]),
            float(seq.timestamps[0]), jnp.asarray(seq.grays[0]),
        )

    # track 2 frames, checkpoint, track the 3rd
    trk = new_tracker()
    for f in (1, 2):
        trk.track(float(seq.timestamps[f]), jnp.asarray(seq.depths[f]),
                  float(seq.timestamps[f]), jnp.asarray(seq.grays[f]))
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_tracker(path, trk)
    trk.track(float(seq.timestamps[3]), jnp.asarray(seq.depths[3]),
              float(seq.timestamps[3]), jnp.asarray(seq.grays[3]))
    ts_ref, pose_ref = trk.current_frame()

    # fresh tracker, restore, track the 3rd frame -> identical result
    trk2 = new_tracker()
    checkpoint.load_tracker(path, trk2)
    trk2.track(float(seq.timestamps[3]), jnp.asarray(seq.depths[3]),
               float(seq.timestamps[3]), jnp.asarray(seq.grays[3]))
    ts2, pose2 = trk2.current_frame()
    assert ts2 == ts_ref
    np.testing.assert_allclose(np.asarray(pose2.t), np.asarray(pose_ref.t), atol=1e-7)
    np.testing.assert_allclose(np.asarray(pose2.q), np.asarray(pose_ref.q), atol=1e-7)


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5), "b": (jnp.ones((2, 3)), jnp.asarray(2.5))}
    path = str(tmp_path / "t.npz")
    checkpoint.save_pytree(path, tree, {"k": 1})
    restored, meta = checkpoint.load_pytree(path, tree)
    assert meta["k"] == 1
    assert meta["format_version"] == checkpoint.FORMAT_VERSION
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5))
    np.testing.assert_array_equal(np.asarray(restored["b"][0]), np.ones((2, 3)))


def test_checkpoint_refuses_mismatched_config(tmp_path):
    """A checkpoint must not silently resume into a tracker whose config is
    shape-compatible but semantically different (stale-semantics trap)."""
    import pytest

    seq = synthetic.generate_sequence(nb_frames=2, height=48, width=64, seed=0)

    def make(config):
        return tracker_mod.init_tracker(
            config, seq.intrinsics,
            float(seq.timestamps[0]), jnp.asarray(seq.depths[0]),
            float(seq.timestamps[0]), jnp.asarray(seq.grays[0]),
        )

    config = tracker_mod.TrackerConfig(height=48, width=64, nb_levels=3, candidate_cap=256)
    trk = make(config)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_tracker(path, trk)

    # same shapes, different semantics: changed LM constant and interp method
    import dataclasses

    for other in (
        dataclasses.replace(config, energy_tol=0.5),
        dataclasses.replace(config, interp_method="gather"),
    ):
        trk2 = make(other)
        with pytest.raises(checkpoint.CheckpointMismatchError):
            checkpoint.load_tracker(path, trk2)

    # matching config still loads
    trk3 = make(config)
    checkpoint.load_tracker(path, trk3)

    # old/unversioned checkpoints are refused with a clear error
    checkpoint.save_pytree(
        str(tmp_path / "old.npz"),
        {"keyframe_data": trk.keyframe_data,
         "keyframe_pose": trk.keyframe_pose,
         "current_pose": trk.current_pose},
        {"format_version": 1},
    )
    with pytest.raises(checkpoint.CheckpointMismatchError):
        checkpoint.load_tracker(str(tmp_path / "old.npz"), make(config))


def test_session_metrics():
    s = metrics.SessionMetrics()
    for i in range(4):
        s.record(metrics.FrameMetrics(
            frame_index=i, timestamp=i / 30.0, optical_flow=0.5 * i,
            keyframe_switched=(i == 2), failed=False, track_seconds=0.01,
        ))
    assert s.nb_frames == 4
    assert s.nb_keyframe_switches == 1
    assert s.nb_failures == 0
    assert abs(s.mean_fps - 100.0) < 1e-6
    summary = s.summary()
    assert summary["frames"] == 4
    # JSON-serializable records
    import json

    json.loads(s.frames[0].to_json())

def test_cli_resume_mismatch_clean_error(tmp_path, capsys):
    """--resume with an incompatible checkpoint must print a clean error and
    return 1, not traceback (old checkpoints lack format_version 2)."""
    from visual_odometry_rs_tpu.cli import vors_track
    from visual_odometry_rs_tpu.dataset import tum_rgbd

    seq = synthetic.generate_sequence(nb_frames=2, height=48, width=64, seed=0)
    assoc = tum_rgbd.write_sequence(str(tmp_path), seq.grays, seq.depths, seq.timestamps)
    config = tracker_mod.TrackerConfig(height=48, width=64, nb_levels=3, candidate_cap=256)
    trk = tracker_mod.init_tracker(
        config, seq.intrinsics, 0.0, jnp.asarray(seq.depths[0]), 0.0,
        jnp.asarray(seq.grays[0]),
    )
    path = str(tmp_path / "old.npz")
    # simulate a pre-versioning checkpoint: same layout, no fingerprint
    checkpoint.save_pytree(
        path,
        {"keyframe_data": trk.keyframe_data, "keyframe_pose": trk.keyframe_pose,
         "current_pose": trk.current_pose},
        {"format_version": 1},
    )
    rc = vors_track.main(
        ["fr1", assoc, "--nb-levels", "3", "--candidate-cap", "256",
         "--resume", path]
    )
    assert rc == 1
    assert "Cannot resume" in capsys.readouterr().err


def test_slam_checkpoint_roundtrip(tmp_path):
    """save_slam/load_slam restore tracker state + trajectory + keyframe
    store so a resumed vors_slam continues identically (verdict item 6)."""
    seq = synthetic.generate_sequence(nb_frames=5, height=48, width=64, seed=3,
                                      twist_per_frame=[0.05, 0, 0, 0, 0, 0])
    config = tracker_mod.TrackerConfig(height=48, width=64, nb_levels=3,
                                       candidate_cap=256)

    def make():
        return tracker_mod.init_tracker(
            config, seq.intrinsics, 0.0, jnp.asarray(seq.depths[0]),
            0.0, jnp.asarray(seq.grays[0]),
        )

    trk = make()
    trajectory = [trk.current_pose]
    timestamps = [0.0]
    keyframe_ids = [0]
    kf_images = {0: (seq.depths[0], seq.grays[0])}
    for f in (1, 2):
        before = trk.keyframe_switches
        trk.track(float(f), jnp.asarray(seq.depths[f]), float(f),
                  jnp.asarray(seq.grays[f]))
        trajectory.append(trk.current_pose)
        timestamps.append(float(f))
        if trk.keyframe_switches > before:
            keyframe_ids.append(f)
            kf_images[f] = (seq.depths[f], seq.grays[f])
    path = str(tmp_path / "slam.npz")
    checkpoint.save_slam(path, trk, trajectory, timestamps, keyframe_ids,
                         kf_images, frames_done=2)

    trk2 = make()
    traj2, ts2, kids2, kimgs2, done2 = checkpoint.load_slam(path, trk2)
    assert done2 == 2
    assert kids2 == keyframe_ids
    assert ts2 == timestamps
    for a, b in zip(traj2, trajectory):
        np.testing.assert_array_equal(np.asarray(a.q), np.asarray(b.q))
        np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    for fid in keyframe_ids:
        np.testing.assert_array_equal(kimgs2[fid][0], np.asarray(kf_images[fid][0]))

    # both trackers continue identically on the next frame
    for t in (trk, trk2):
        t.track(3.0, jnp.asarray(seq.depths[3]), 3.0, jnp.asarray(seq.grays[3]))
    np.testing.assert_array_equal(
        np.asarray(trk.current_pose.t), np.asarray(trk2.current_pose.t)
    )

    # mismatched config must refuse
    config2 = tracker_mod.TrackerConfig(height=48, width=64, nb_levels=3,
                                        candidate_cap=256, robust_delta=5.0)
    trk3 = tracker_mod.init_tracker(
        config2, seq.intrinsics, 0.0, jnp.asarray(seq.depths[0]),
        0.0, jnp.asarray(seq.grays[0]),
    )
    import pytest as _pytest
    with _pytest.raises(checkpoint.CheckpointMismatchError):
        checkpoint.load_slam(path, trk3)


def test_cli_track_resume_overlap_warning(tmp_path, capsys):
    """vors_track --resume continues into the SUPPLIED file (stateless
    stream model); resuming with a file that overlaps the checkpoint's
    already-tracked frames must warn about double-tracking, and resuming
    with only the remaining frames must not."""
    from visual_odometry_rs_tpu.cli import vors_track
    from visual_odometry_rs_tpu.dataset import synthetic, tum_rgbd

    seq = synthetic.generate_sequence(nb_frames=4, height=48, width=64, seed=2)
    assoc = tum_rgbd.write_sequence(
        str(tmp_path), seq.grays, seq.depths, seq.timestamps
    )
    ckpt = str(tmp_path / "t.npz")
    args = ["fr1", assoc, "--nb-levels", "3", "--candidate-cap", "256"]
    rc = vors_track.main(args + ["--save-state", ckpt])
    assert rc == 0
    capsys.readouterr()

    # same full file again: every frame predates the checkpoint -> warn
    rc = vors_track.main(args + ["--resume", ckpt])
    assert rc == 0
    assert "double-tracked" in capsys.readouterr().err

    # continuation file (header + init frame + nothing consumed): the
    # loader needs >= 2 lines, so append a genuinely new frame
    with open(assoc) as f:
        lines = [l for l in f.read().splitlines() if l.strip() and not l.startswith("#")]
    cont = str(tmp_path / "cont.txt")
    extra_dir = tmp_path / "extra"
    seq2 = synthetic.generate_sequence(nb_frames=2, height=48, width=64, seed=2)
    extra_assoc = tum_rgbd.write_sequence(
        str(extra_dir), seq2.grays, seq2.depths,
        seq2.timestamps + float(seq.timestamps[-1]) + 1.0,
    )
    with open(extra_assoc) as f:
        extra_lines = [
            l for l in f.read().splitlines() if l.strip() and not l.startswith("#")
        ]
    import os
    with open(cont, "w") as f:
        # keep the last already-tracked frame as the (untracked) init line,
        # then the new future frame
        f.write(lines[-1] + "\n")
        prefix = os.path.relpath(str(extra_dir), str(tmp_path))
        for l in extra_lines[-1:]:
            ts1, p1, ts2, p2 = l.split()
            f.write(f"{ts1} {prefix}/{p1} {ts2} {prefix}/{p2}\n")
    rc = vors_track.main(
        ["fr1", cont, "--nb-levels", "3", "--candidate-cap", "256",
         "--resume", ckpt]
    )
    assert rc == 0
    assert "double-tracked" not in capsys.readouterr().err


def test_fingerprint_stable_across_added_default_fields():
    """Adding TrackerConfig knobs must not orphan existing checkpoints:
    fields in checkpoint._FINGERPRINT_DEFAULT_EXCLUDED are dropped from the
    fingerprint payload while at their defaults (a pre-round-4 checkpoint,
    whose config never had them, hashes identically), and a NON-default
    value — which changes tracking semantics — changes the fingerprint."""
    import dataclasses
    import hashlib
    import json

    config = tracker_mod.TrackerConfig(
        height=48, width=64, nb_levels=3, candidate_cap=256
    )
    # simulate the pre-round-4 fingerprint: hash of asdict WITHOUT the
    # later-added fields
    d = dataclasses.asdict(config)
    for k in checkpoint._FINGERPRINT_DEFAULT_EXCLUDED:
        assert k in d  # the exclusion list tracks real fields
        d.pop(k)
    legacy = hashlib.sha256(
        json.dumps({"config": d}, sort_keys=True).encode()
    ).hexdigest()[:16]
    assert checkpoint.config_fingerprint(config) == legacy

    # exclusion-list defaults must MATCH the dataclass defaults — otherwise
    # a default config would hash differently from a legacy one
    ref = tracker_mod.TrackerConfig(height=1, width=1)
    for k, v in checkpoint._FINGERPRINT_DEFAULT_EXCLUDED.items():
        assert getattr(ref, k) == v, k

    # a non-default selector changes semantics -> changes the fingerprint
    cfg_dso = dataclasses.replace(config, candidate_selector="dso")
    assert checkpoint.config_fingerprint(cfg_dso) != legacy
    cfg_tgt = dataclasses.replace(config, dso_target=999)
    assert checkpoint.config_fingerprint(cfg_tgt) != legacy


def test_checkpoint_resume_tracker_velocity_carry(tmp_path):
    """constant-velocity warm start: the prev-pose carry rides the tracker
    checkpoint, so a resumed tracker reproduces the uninterrupted run
    exactly (round-5 review finding: the carry was silently left at the
    construction-time identity, making the first post-resume init
    extrapolate across the whole trajectory)."""
    import dataclasses

    seq = synthetic.generate_sequence(
        nb_frames=5, height=48, width=64, seed=2,
        twist_per_frame=[0.02, 0.0, 0.0, 0.0, 0.002, 0.0],
    )
    config = dataclasses.replace(
        tracker_mod.TrackerConfig(
            height=48, width=64, nb_levels=3, candidate_cap=256
        ),
        warm_start="constant_velocity",
    )

    def new_tracker():
        return tracker_mod.init_tracker(
            config, seq.intrinsics,
            float(seq.timestamps[0]), jnp.asarray(seq.depths[0]),
            float(seq.timestamps[0]), jnp.asarray(seq.grays[0]),
        )

    trk = new_tracker()
    prev_at_save = None
    for f in (1, 2, 3):
        trk.track(float(seq.timestamps[f]), jnp.asarray(seq.depths[f]),
                  float(seq.timestamps[f]), jnp.asarray(seq.grays[f]))
        if f == 2:
            path = str(tmp_path / "cv.npz")
            checkpoint.save_tracker(path, trk)
            prev_at_save = np.asarray(trk.prev_pose.t).copy()
    _, pose_ref = trk.current_frame()

    trk2 = new_tracker()
    checkpoint.load_tracker(path, trk2)
    # the restored carry must be the SAVED prev pose (nonzero after two
    # tracked frames), not the construction-time identity
    np.testing.assert_array_equal(np.asarray(trk2.prev_pose.t), prev_at_save)
    assert np.linalg.norm(prev_at_save) > 1e-3
    trk2.track(float(seq.timestamps[3]), jnp.asarray(seq.depths[3]),
               float(seq.timestamps[3]), jnp.asarray(seq.grays[3]))
    _, pose2 = trk2.current_frame()
    np.testing.assert_allclose(
        np.asarray(pose2.t), np.asarray(pose_ref.t), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(pose2.q), np.asarray(pose_ref.q), atol=1e-7
    )

    # a cp checkpoint (no carry leaf) restores into a cp tracker unchanged
    cfg_cp = dataclasses.replace(config, warm_start="constant_position")
    trk3 = tracker_mod.init_tracker(
        cfg_cp, seq.intrinsics,
        float(seq.timestamps[0]), jnp.asarray(seq.depths[0]),
        float(seq.timestamps[0]), jnp.asarray(seq.grays[0]),
    )
    path_cp = str(tmp_path / "cp.npz")
    checkpoint.save_tracker(path_cp, trk3)
    checkpoint.load_tracker(path_cp, trk3)
    np.testing.assert_array_equal(
        np.asarray(trk3.prev_pose.t), np.asarray(trk3.current_pose.t)
    )
