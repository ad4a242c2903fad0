"""Relocalization (models/relocalize.py + Tracker integration).

The reference has no recovery path (a lost frame keeps its previous pose,
inverse_compositional.rs:195-199); these tests pin the green-field
"kidnapped robot" recovery: a frame that cannot be tracked from the current
anchor is re-tracked against the keyframe ring and recovers when the camera
has returned to a known place.
"""

import numpy as np
import jax.numpy as jnp

from visual_odometry_rs_tpu.dataset import synthetic, tum_rgbd
from visual_odometry_rs_tpu.math import pose as pose_mod
from visual_odometry_rs_tpu.models import relocalize, tracker as tracker_mod
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops


def _config(**kw):
    base = dict(
        height=120, width=160, nb_levels=3, candidate_cap=1024,
        depth_scale=tum_rgbd.DEPTH_SCALE, idepth_variance=1e-4,
        interp_method="gather",
    )
    base.update(kw)
    return tracker_mod.TrackerConfig(**base)


def test_attempt_picks_the_right_keyframe():
    """Two keyframes at distant poses; a query frame rendered near keyframe
    0.  ``attempt`` must verify, choose keyframe 0, and recover the query's
    camera-to-world pose — from identity inits (the stale current pose is
    exactly what cannot be trusted after a kidnap)."""
    # frame 0: identity.  frame 1: far away.  frame 2: small offset from
    # frame 0 (the "returned" query view).
    far = [0.35, 0.05, 0.02, 0.0, 0.25, 0.0]
    back = [-0.35 + 0.02, -0.05, -0.02 + 0.01, 0.002, -0.25, 0.003]
    twists = np.asarray([far, back], np.float32)
    seq = synthetic.generate_sequence(
        nb_frames=3, height=120, width=160, seed=21, twist_per_frame=twists,
    )
    config = _config()
    intr = seq.intrinsics

    def kf(i):
        pyr = pyramid_ops.mean_pyramid(config.nb_levels, jnp.asarray(seq.grays[i]))
        return tracker_mod.precompute_keyframe(
            config, intr, jnp.asarray(seq.depths[i]), pyr
        )

    history = [
        (kf(0), seq.poses[0], 0.0, 0.0),
        (kf(1), seq.poses[1], 1.0, 1.0),
    ]
    kfs, kf_q, kf_t = relocalize.stack_history(history)
    query_pyr = pyramid_ops.mean_pyramid(
        config.nb_levels, jnp.asarray(seq.grays[2])
    )
    res = relocalize.attempt(
        config, kfs, kf_q, kf_t, query_pyr,
        energy_accept=150.0, min_inside_frac=0.5,
    )
    assert bool(res.ok), float(res.energy)
    assert int(res.best) == 0
    gt = seq.poses[2]
    np.testing.assert_allclose(
        np.asarray(res.pose.t), np.asarray(gt.t), atol=5e-3
    )
    q_est, q_gt = np.asarray(res.pose.q), np.asarray(gt.q)
    assert min(np.abs(q_est - q_gt).max(), np.abs(q_est + q_gt).max()) < 5e-3


def test_attempt_rejects_unmatchable_frame():
    """A pure-noise query must not verify against any keyframe."""
    seq = synthetic.generate_sequence(nb_frames=2, height=120, width=160, seed=22)
    config = _config()
    pyr0 = pyramid_ops.mean_pyramid(config.nb_levels, jnp.asarray(seq.grays[0]))
    kf0 = tracker_mod.precompute_keyframe(
        config, seq.intrinsics, jnp.asarray(seq.depths[0]), pyr0
    )
    history = [(kf0, seq.poses[0], 0.0, 0.0)]
    kfs, kf_q, kf_t = relocalize.stack_history(history)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (120, 160)).astype(np.uint8)
    noise_pyr = pyramid_ops.mean_pyramid(config.nb_levels, jnp.asarray(noise))
    res = relocalize.attempt(
        config, kfs, kf_q, kf_t, noise_pyr,
        energy_accept=150.0, min_inside_frac=0.5,
    )
    assert not bool(res.ok), float(res.energy)


def test_tracker_relocalizes_after_kidnap():
    """Streaming Tracker: drive away (creating keyframes), then kidnap the
    camera back to the start.  With ``relocalize_window`` the tracker must
    recover poses near ground truth; the reference-exact tracker (window=0)
    must end with a much larger error on the post-kidnap frames."""
    step = [0.09, 0.01, 0.005, 0.0, 0.06, 0.0]
    out = [step] * 4
    # kidnap: one giant jump back to the start, then two small steps
    total = -4.0 * np.asarray(step)
    small = [0.01, 0.002, 0.001, 0.0, 0.005, 0.0]
    twists = np.asarray(out + [list(total)] + [small, small], np.float32)
    seq = synthetic.generate_sequence(
        nb_frames=len(twists) + 1, height=120, width=160, seed=23,
        twist_per_frame=twists,
    )

    def run(window):
        config = _config(
            relocalize_window=window, relocalize_energy_accept=150.0,
            flow_threshold=1.0,
        )
        trk = tracker_mod.init_tracker(
            config, seq.intrinsics, 0.0, jnp.asarray(seq.depths[0]),
            0.0, jnp.asarray(seq.grays[0]),
        )
        poses = [pose_mod.identity()]
        for i in range(1, len(seq.grays)):
            trk.track(float(i), jnp.asarray(seq.depths[i]),
                      float(i), jnp.asarray(seq.grays[i]))
            poses.append(trk.current_pose)
        return trk, poses

    trk_off, poses_off = run(0)
    trk_on, poses_on = run(4)
    assert trk_off.relocalizations == 0
    assert trk_on.relocalizations >= 1

    def tail_err(poses):
        errs = []
        for i in range(len(twists) - 1, len(twists) + 1):
            errs.append(
                float(np.linalg.norm(np.asarray(poses[i].t) - np.asarray(seq.poses[i].t)))
            )
        return max(errs)

    err_on = tail_err(poses_on)
    err_off = tail_err(poses_off)
    assert err_on < 0.02, (err_on, err_off)
    assert err_off > 5 * err_on, (err_on, err_off)


def test_tracker_relocalize_noop_on_healthy_sequence():
    """With relocalization enabled, a healthy sequence must produce the
    exact same trajectory as the reference-exact tracker (the recovery path
    must never fire, and the diagnostics energy eval must not perturb the
    pose dataflow)."""
    seq = synthetic.generate_sequence(
        nb_frames=6, height=120, width=160, seed=24,
        motion_scale=0.012, rot_scale=0.004,
    )

    def run(window):
        config = _config(relocalize_window=window)
        trk = tracker_mod.init_tracker(
            config, seq.intrinsics, 0.0, jnp.asarray(seq.depths[0]),
            0.0, jnp.asarray(seq.grays[0]),
        )
        poses = []
        for i in range(1, len(seq.grays)):
            trk.track(float(i), jnp.asarray(seq.depths[i]),
                      float(i), jnp.asarray(seq.grays[i]))
            poses.append(trk.current_pose)
        return trk, poses

    trk_off, poses_off = run(0)
    trk_on, poses_on = run(4)
    assert trk_on.relocalizations == 0
    assert trk_on.keyframe_switches == trk_off.keyframe_switches
    for a, b in zip(poses_on, poses_off):
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), atol=1e-7)
        np.testing.assert_allclose(np.asarray(a.q), np.asarray(b.q), atol=1e-7)


def test_attempt_with_robust_and_brightness_configs():
    """The vmapped relocalization solve must compose with the tracker's
    opt-in extensions (Huber robust weighting, affine brightness) — the
    same cross-product the batched drivers pin (round-2 verdict item 7)."""
    far = [0.35, 0.05, 0.02, 0.0, 0.25, 0.0]
    back = [-0.35 + 0.02, -0.05, -0.02 + 0.01, 0.002, -0.25, 0.003]
    twists = np.asarray([far, back], np.float32)
    seq = synthetic.generate_sequence(
        nb_frames=3, height=120, width=160, seed=21, twist_per_frame=twists,
    )
    for opts in (dict(robust_delta=20.0), dict(brightness_model=True),
                 dict(robust_delta=20.0, brightness_model=True)):
        config = _config(**opts)

        def kf(i):
            pyr = pyramid_ops.mean_pyramid(
                config.nb_levels, jnp.asarray(seq.grays[i])
            )
            return tracker_mod.precompute_keyframe(
                config, seq.intrinsics, jnp.asarray(seq.depths[i]), pyr
            )

        history = [(kf(0), seq.poses[0], 0.0, 0.0), (kf(1), seq.poses[1], 1.0, 1.0)]
        kfs, kf_q, kf_t = relocalize.stack_history(history)
        query_pyr = pyramid_ops.mean_pyramid(
            config.nb_levels, jnp.asarray(seq.grays[2])
        )
        res = relocalize.attempt(
            config, kfs, kf_q, kf_t, query_pyr,
            energy_accept=150.0, min_inside_frac=0.5,
        )
        assert bool(res.ok), (opts, float(res.energy))
        assert int(res.best) == 0, opts
        np.testing.assert_allclose(
            np.asarray(res.pose.t), np.asarray(seq.poses[2].t), atol=8e-3,
            err_msg=str(opts),
        )
