"""ATE/RPE evaluation tests."""

import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.eval import ate
from visual_odometry_rs_tpu.math import pose as pose_mod
from visual_odometry_rs_tpu.math import se3


def _traj(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    poses = [pose_mod.identity()]
    for _ in range(n - 1):
        xi = jnp.asarray(0.1 * scale * rng.normal(size=6), jnp.float32)
        poses.append(pose_mod.compose(poses[-1], se3.exp(xi)))
    return poses


def test_ate_zero_for_identical():
    traj = _traj(10)
    assert ate.ate_rmse(traj, traj) < 1e-6


def test_ate_invariant_to_rigid_transform():
    traj = _traj(12, seed=1)
    offset = se3.exp(jnp.array([1.0, -2.0, 0.5, 0.3, -0.2, 0.1]))
    moved = [pose_mod.compose(offset, p) for p in traj]
    assert ate.ate_rmse(moved, traj) < 1e-5


def test_ate_detects_error():
    traj = _traj(10, seed=2)
    noisy = [
        pose_mod.Pose(p.q, p.t + 0.05 * np.random.default_rng(i).normal(size=3).astype(np.float32))
        for i, p in enumerate(traj)
    ]
    err = ate.ate_rmse(noisy, traj)
    assert 0.01 < err < 0.2


def test_umeyama_with_scale():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(20, 3))
    R_gt, _, _ = np.linalg.svd(rng.normal(size=(3, 3)))
    if np.linalg.det(R_gt) < 0:
        R_gt[:, 0] *= -1
    dst = 2.5 * src @ R_gt.T + np.array([1.0, 2.0, 3.0])
    R, t, s = ate.umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, 2.5, rtol=1e-6)
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    aligned = (s * (R @ src.T)).T + t
    np.testing.assert_allclose(aligned, dst, atol=1e-6)


def test_rpe():
    traj = _traj(10, seed=4)
    t_err, r_err = ate.rpe_rmse(traj, traj)
    assert t_err < 1e-6 and r_err < 1e-3


def _rpe_loop(estimated, ground_truth, delta=1):
    """Scalar per-pair reference implementation (the pre-round-5 host loop)."""
    t_errs, r_errs = [], []
    for i in range(len(estimated) - delta):
        def rel(a, b):
            return pose_mod.compose(pose_mod.inverse(a), b)

        rel_est = rel(estimated[i], estimated[i + delta])
        rel_gt = rel(ground_truth[i], ground_truth[i + delta])
        err = pose_mod.compose(pose_mod.inverse(rel_gt), rel_est)
        t_errs.append(float(jnp.linalg.norm(err.t)))
        w = float(jnp.clip(jnp.abs(err.q[0]), 0.0, 1.0))
        r_errs.append(2.0 * float(np.arccos(w)))
    return (
        float(np.sqrt(np.mean(np.square(t_errs)))),
        float(np.sqrt(np.mean(np.square(r_errs)))),
    )


def test_rpe_vectorized_matches_loop():
    """The round-5 one-dispatch RPE equals the per-pair host loop."""
    est = _traj(15, seed=5)
    gt = _traj(15, seed=6)
    for delta in (1, 3):
        t_v, r_v = ate.rpe_rmse(est, gt, delta=delta)
        t_l, r_l = _rpe_loop(est, gt, delta=delta)
        np.testing.assert_allclose(t_v, t_l, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(r_v, r_l, rtol=1e-5, atol=1e-7)


def test_rpe_empty_pairs():
    traj = _traj(3, seed=7)
    assert ate.rpe_rmse(traj, traj, delta=5) == (0.0, 0.0)


def test_vors_eval_cli(tmp_path, capsys):
    """vors_eval: track a synthetic clip, write ground truth, evaluate."""
    import io
    import json
    from contextlib import redirect_stdout

    import jax.numpy as jnp

    from visual_odometry_rs_tpu.cli import vors_eval, vors_track
    from visual_odometry_rs_tpu.dataset import synthetic, tum_rgbd

    seq = synthetic.generate_sequence(nb_frames=5, height=48, width=64, seed=4)
    assoc = tum_rgbd.write_sequence(str(tmp_path), seq.grays, seq.depths, seq.timestamps)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = vors_track.main(["fr1", assoc, "--nb-levels", "3", "--candidate-cap", "256"])
    assert rc == 0
    traj = tmp_path / "traj.txt"
    traj.write_text(buf.getvalue())
    gt_path = tmp_path / "gt.txt"
    lines = [
        tum_rgbd.Frame(timestamp=float(seq.timestamps[i]), pose=seq.poses[i]).to_string()
        for i in range(5)
    ]
    gt_path.write_text("# ground truth\n" + "\n".join(lines) + "\n")

    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        rc = vors_eval.main([str(gt_path), str(traj)])
    assert rc == 0
    result = json.loads(buf2.getvalue())
    assert result["matched_frames"] == 4
    assert 0.0 <= result["ate_rmse_m"] < 0.5
    assert result["rpe_trans_rmse_m"] >= 0.0


def test_vors_eval_large_delta_yields_null_rpe(tmp_path, capsys):
    """--delta >= matched frames: RPE fields must be null, output valid JSON."""
    import io
    import json
    from contextlib import redirect_stdout

    from visual_odometry_rs_tpu.cli import vors_eval
    from visual_odometry_rs_tpu.dataset import tum_rgbd
    from visual_odometry_rs_tpu.math import pose as pose_mod

    lines = "\n".join(
        tum_rgbd.Frame(timestamp=float(i), pose=pose_mod.identity()).to_string()
        for i in range(3)
    )
    gt = tmp_path / "gt.txt"; gt.write_text(lines + "\n")
    tr = tmp_path / "tr.txt"; tr.write_text(lines + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = vors_eval.main([str(gt), str(tr), "--delta", "5"])
    assert rc == 0
    result = json.loads(buf.getvalue())  # must be strict-JSON parseable
    assert result["rpe_trans_rmse_m"] is None


def test_vors_eval_malformed_trajectory_returns_error(tmp_path):
    from visual_odometry_rs_tpu.cli import vors_eval

    gt = tmp_path / "gt.txt"; gt.write_text("1.0 0 0 0 0 0 0 1\n")
    tr = tmp_path / "tr.txt"; tr.write_text("1.0 0 0 0 0 0 1\n")  # 7 fields
    assert vors_eval.main([str(gt), str(tr)]) == 1
