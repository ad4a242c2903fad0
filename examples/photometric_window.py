"""Windowed photometric bundle adjustment demo (multi-frame depth refinement).

The capability the reference defers to future work ("sliding window of
keyframes optimization as in DSO", reference README.md:54-55): jointly refine
a keyframe window's poses AND the keyframe candidates' inverse depths by
minimizing photometric residuals over every (frame, candidate) pair with a
Schur-reduced LM solve (depth blocks are scalar — embarrassingly parallel).

The demo simulates a noisy depth sensor (5% inverse-depth noise) and shows
the window consolidating multi-frame photometric evidence into a ~3x
depth-error reduction, with the sensor prior weighted by its variance.

Run:  python examples/photometric_window.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.math import pose as pose_mod
from visual_odometry_rs_tpu.math.pose import Pose
from visual_odometry_rs_tpu.models import photometric_ba, tracker as tracker_mod
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops


def main():
    h, w, F = 120, 160, 6
    seq = synthetic.generate_sequence(
        nb_frames=F, height=h, width=w, seed=3, motion_scale=0.02
    )
    config = tracker_mod.TrackerConfig(
        height=h, width=w, nb_levels=3, candidate_cap=1024
    )
    pyr0 = pyramid_ops.mean_pyramid(config.nb_levels, jnp.asarray(seq.grays[0]))
    kf = jax.jit(
        lambda d, p: tracker_mod.precompute_keyframe(config, seq.intrinsics, d, p)
    )(jnp.asarray(seq.depths[0]), pyr0)
    images = jnp.asarray(np.stack(seq.grays)).astype(jnp.float32)

    gt_rel = [pose_mod.compose(pose_mod.inverse(p), seq.poses[0]) for p in seq.poses]
    gt_poses = Pose(jnp.stack([p.q for p in gt_rel]), jnp.stack([p.t for p in gt_rel]))

    win = photometric_ba.window_from_tracking(
        config, seq.intrinsics, kf.levels, images, gt_poses
    )
    # simulate a noisy depth sensor: 5% multiplicative inverse-depth noise
    rng = np.random.default_rng(0)
    true_idepth = win.idepth
    noisy = true_idepth * jnp.asarray(
        1.0 + 0.05 * rng.normal(size=true_idepth.shape), jnp.float32
    )
    win = win._replace(idepth=jnp.where(win.valid, noisy, true_idepth))

    # prior weight matched to the simulated sensor: sigma_d ~ 5% of idepth
    # ~0.02 -> weight ~ 1/0.02^2 / intensity-noise ~ a few hundred
    result = jax.jit(
        lambda w: photometric_ba.solve_window(
            w, max_iterations=30, idepth_prior_weight=400.0
        )
    )(win)

    valid = np.asarray(win.valid)
    err_before = np.abs(np.asarray(win.idepth) - np.asarray(true_idepth))[valid]
    err_after = np.abs(np.asarray(result.idepth) - np.asarray(true_idepth))[valid]
    pose_err = np.abs(np.asarray(result.poses.t) - np.asarray(gt_poses.t)).max()
    print(f"window of {F} frames, {int(valid.sum())} candidates")
    print(f"LM iterations: {int(result.nb_iter)}, final energy {float(result.energy):.1f}")
    print(f"inverse-depth mean |error|: {err_before.mean():.4f} -> {err_after.mean():.4f}")
    print(f"pose max |t error|: {1e3 * pose_err:.2f} mm (photometric bias floor)")


if __name__ == "__main__":
    main()
