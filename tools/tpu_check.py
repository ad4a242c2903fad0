"""TPU integration check: track a full synthetic sequence on the real chip
and validate accuracy end-to-end (keyframe switches included).

The pytest suite is hermetic on CPU (8 virtual devices); this script is the
on-hardware complement: it runs the flagship tracker at full resolution on
the attached TPU, checks ATE against the synthetic ground truth, and
cross-checks the fused-scan serving driver against the host tracker.

Run:  python tools/tpu_check.py        (requires the TPU backend)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visual_odometry_rs_tpu.dataset import synthetic
    from visual_odometry_rs_tpu.eval import ate
    from visual_odometry_rs_tpu.math import pose as pose_mod
    from visual_odometry_rs_tpu.models import tracker as tracker_mod
    from visual_odometry_rs_tpu.parallel import batch as batch_mod

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})")

    h, w, F = 480, 640, 10
    seq = synthetic.generate_sequence(
        nb_frames=F, height=h, width=w, seed=42, motion_scale=0.035
    )
    config = tracker_mod.TrackerConfig(
        height=h, width=w, nb_levels=6, candidate_cap=4096
    )

    # --- host Tracker (streaming API), keyframe switches exercised --------
    trk = tracker_mod.init_tracker(
        config, seq.intrinsics, 0.0, jnp.asarray(seq.depths[0]),
        0.0, jnp.asarray(seq.grays[0]),
    )
    est = [pose_mod.identity()]
    t0 = time.perf_counter()
    for f in range(1, F):
        trk.track(float(f), jnp.asarray(seq.depths[f]), float(f), jnp.asarray(seq.grays[f]))
        est.append(trk.current_frame()[1])
    host_s = time.perf_counter() - t0
    err_host = float(ate.ate_rmse(est, seq.poses))
    print(
        f"host tracker: ATE {err_host:.4f} m, {trk.keyframe_switches} keyframe "
        f"switches, {F - 1} frames in {host_s:.2f}s"
    )
    assert err_host < 0.02, f"host-tracker ATE too high on TPU: {err_host}"
    assert trk.keyframe_switches >= 1, "expected at least one keyframe switch"

    # --- fused scan driver: same clip, one dispatch ------------------------
    state = jax.jit(
        lambda d, g: batch_mod.init_state(config, seq.intrinsics, d, g)
    )(jnp.asarray(seq.depths[0]), jnp.asarray(seq.grays[0]))
    clip_d = jnp.asarray(np.stack(seq.depths[1:]))
    clip_g = jnp.asarray(np.stack(seq.grays[1:]))
    run = jax.jit(
        lambda s, dd, gg: batch_mod.track_sequence(config, seq.intrinsics, s, dd, gg)
    )
    final, (poses, diags) = run(state, clip_d, clip_g)
    jax.block_until_ready(final.current_pose.t)
    est_scan = [pose_mod.identity()] + [
        pose_mod.Pose(poses.q[i], poses.t[i]) for i in range(F - 1)
    ]
    err_scan = float(ate.ate_rmse(est_scan, seq.poses))
    n_switches = int(np.asarray(diags.switched).sum())
    print(f"fused scan:  ATE {err_scan:.4f} m, {n_switches} keyframe switches")
    assert err_scan < 0.02, f"scan-driver ATE too high on TPU: {err_scan}"
    assert not bool(np.asarray(diags.failed).any())

    print("tpu_check ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
