"""Trajectory evaluation: absolute trajectory error (ATE) and relative pose
error (RPE).

The reference delegates this to the external repo
``mpizenberg/rgbd-tracking-evaluation`` (README.md:18-19); here it is
in-repo.  ATE follows the standard TUM protocol: rigid (SE3, or Sim3 with
scale) alignment of the estimated trajectory to ground truth via Umeyama's
method, then RMSE over translational residuals.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..math.pose import Pose


def _positions(poses: Sequence[Pose]) -> np.ndarray:
    return np.stack([np.asarray(p.t, np.float64) for p in poses])


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = False
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares rigid (optionally similarity) transform aligning
    ``src`` (N,3) onto ``dst`` (N,3): returns (R, t, s) with
    ``dst ≈ s R src + t``."""
    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst
    cov = dst_c.T @ src_c / len(src)
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_src = (src_c ** 2).sum() / len(src)
        s = float(np.trace(np.diag(d) @ S) / var_src) if var_src > 0 else 1.0
    else:
        s = 1.0
    t = mu_dst - s * R @ mu_src
    return R, t, s


def ate_rmse(
    estimated: Sequence[Pose], ground_truth: Sequence[Pose], with_scale: bool = False
) -> float:
    """RMSE of translational error after trajectory alignment (meters)."""
    est = _positions(estimated)
    gt = _positions(ground_truth)
    assert est.shape == gt.shape, (est.shape, gt.shape)
    if len(est) < 2:
        return 0.0
    R, t, s = umeyama_alignment(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    err = np.linalg.norm(aligned - gt, axis=1)
    return float(np.sqrt(np.mean(err ** 2)))


def rpe_rmse(
    estimated: Sequence[Pose], ground_truth: Sequence[Pose], delta: int = 1
) -> Tuple[float, float]:
    """Relative pose error over ``delta``-frame intervals.

    Returns (translational RMSE in meters, rotational RMSE in radians).

    One batched pass over all N-delta pairs (the pose ops broadcast over
    leading axes), so the cost is O(1) device dispatches instead of the
    former O(N) per-pair ``compose`` calls — material at the
    thousands-of-keyframes scale the SLAM back-end supports.
    """
    from ..math import pose as pose_mod
    import jax.numpy as jnp

    if len(estimated) != len(ground_truth):
        # the former per-pair loop raised on mismatched lengths; the batched
        # pass would silently broadcast instead — fail loudly like ate_rmse
        raise ValueError(
            f"trajectory length mismatch: {len(estimated)} estimated vs "
            f"{len(ground_truth)} ground-truth poses"
        )
    n_pairs = len(estimated) - delta
    if n_pairs <= 0:
        return 0.0, 0.0

    def stack(poses: Sequence[Pose]) -> Pose:
        return Pose(
            jnp.stack([jnp.asarray(p.q) for p in poses]),
            jnp.stack([jnp.asarray(p.t) for p in poses]),
        )

    est = stack(estimated)
    gt = stack(ground_truth)

    def rel(p: Pose) -> Pose:
        head = Pose(p.q[:-delta], p.t[:-delta])
        tail = Pose(p.q[delta:], p.t[delta:])
        return pose_mod.compose(pose_mod.inverse(head), tail)

    err = pose_mod.compose(pose_mod.inverse(rel(gt)), rel(est))
    t_err = np.asarray(jnp.linalg.norm(err.t, axis=-1), np.float64)
    w = np.asarray(jnp.clip(jnp.abs(err.q[:, 0]), 0.0, 1.0), np.float64)
    r_err = 2.0 * np.arccos(w)
    return (
        float(np.sqrt(np.mean(np.square(t_err)))),
        float(np.sqrt(np.mean(np.square(r_err)))),
    )
