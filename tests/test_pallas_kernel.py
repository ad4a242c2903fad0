"""Fused Pallas residual-kernel tests (interpret mode on CPU).

The kernel must reproduce the XLA evaluation path bit-for-bit up to f32
summation order; the TPU-compiled path is exercised by bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.math import se3
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops
from visual_odometry_rs_tpu.ops.pallas import residual_kernel as rk


@pytest.fixture(scope="module")
def setup():
    seq = synthetic.generate_sequence(nb_frames=2, height=128, width=256, seed=0)
    config = tracker_mod.TrackerConfig(height=128, width=256, nb_levels=3, candidate_cap=1024)
    pyr0 = pyramid_ops.mean_pyramid(3, jnp.asarray(seq.grays[0]))
    kf = tracker_mod.precompute_keyframe(
        config, seq.intrinsics, jnp.asarray(seq.depths[0]), pyr0
    )
    return seq, config, kf


def _run_kernel(obs, img, model):
    k = obs.intrinsics
    intr = jnp.stack([k.cx, k.cy, k.fx, k.fy, k.skew])
    return rk.fused_residual_reduce(
        img.astype(jnp.float32), obs.xs, obs.ys, obs.idepth, obs.tmpl_vals,
        obs.valid, obs.jacobians, model.q, model.t, intr, interpret=True,
    )


def test_kernel_matches_xla_eval(setup):
    seq, config, kf = setup
    img1 = jnp.asarray(seq.grays[1])
    model = se3.exp(jnp.array([0.005, -0.003, 0.002, 0.001, 0.002, -0.001]))
    for lvl in range(3):
        obs = kf.levels[lvl]
        e_ref, g_ref, H_ref = tracker_mod._eval_full(
            obs, pyramid_ops.mean_pyramid(3, img1)[lvl], model, "gather"
        )
        m, rsq, cnt = _run_kernel(obs, pyramid_ops.mean_pyramid(3, img1)[lvl], model)
        e_k = rsq / cnt
        np.testing.assert_allclose(float(e_k), float(e_ref), rtol=1e-5)
        scale_g = float(jnp.max(jnp.abs(g_ref))) + 1.0
        scale_h = float(jnp.max(jnp.abs(H_ref))) + 1.0
        np.testing.assert_allclose(
            np.asarray(m[:, 6]) / scale_g, np.asarray(g_ref) / scale_g, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(m[:, :6]) / scale_h, np.asarray(H_ref) / scale_h, rtol=1e-4, atol=1e-5
        )


def test_kernel_pads_non_tile_multiple(setup):
    seq, config, kf = setup
    obs = kf.levels[2]  # coarsest level: capacity not a TILE multiple
    img = pyramid_ops.mean_pyramid(3, jnp.asarray(seq.grays[1]))[2]
    model = se3.exp(jnp.zeros(6))
    m, rsq, cnt = _run_kernel(obs, img, model)
    assert np.isfinite(float(rsq)) and float(cnt) > 0


def test_tracker_with_pallas_method_matches_gather(setup):
    seq, config, kf = setup
    import dataclasses

    cfg_pallas = dataclasses.replace(config, interp_method="pallas")
    cfg_gather = dataclasses.replace(config, interp_method="gather")
    from visual_odometry_rs_tpu.math import pose as pose_mod

    pyr1 = pyramid_ops.mean_pyramid(3, jnp.asarray(seq.grays[1]))
    r1 = tracker_mod.track_frame(cfg_gather, kf, pyr1, pose_mod.identity())
    r2 = tracker_mod.track_frame(cfg_pallas, kf, pyr1, pose_mod.identity())
    assert not bool(r1.failed) and not bool(r2.failed)
    # the two interp paths reassociate f32 sums, so LM accept/reject near
    # the d_energy <= 1.0 stop can flip; poses agree within the stopping
    # basin (cf. tests/test_oracle.py full-track analysis)
    np.testing.assert_allclose(np.asarray(r2.model.t), np.asarray(r1.model.t), atol=5e-3)
    np.testing.assert_allclose(float(r2.flow), float(r1.flow), rtol=0.15, atol=2e-2)
