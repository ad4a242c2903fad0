"""Per-level interpolation-method A/B for the full 6-level frame solve.

VERDICT round-1 item 8: the uniform interp choice was never A/B'd against a
per-level hybrid (gather at the fine levels where H*W dominates the one-hot
matmul cost, one-hot at the coarse levels, and the converse).  This tool
measures the complete coarse-to-fine track of one frame under each policy
with scan-amortized in-graph timing (per-dispatch timing over the axon
tunnel is unreliable; see docs/PERF.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.math import pose as pose_mod
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops

H, W, K = 480, 640, 16


def track_with_policy(config, kf, pyr, init_model, methods):
    """track_frame with a per-level interp method list (coarse->fine order
    matches reversed(range(nb_levels)) like the production loop)."""
    model = init_model
    failed = jnp.asarray(False)
    for lvl in reversed(range(config.nb_levels)):
        result = tracker_mod.solve_level(
            kf.levels[lvl], pyr[lvl], model,
            lm_coef_init=config.lm_coef_init,
            max_iterations=config.max_iterations,
            energy_tol=config.energy_tol,
            interp_method=methods[lvl],
        )
        model = jax.tree_util.tree_map(
            lambda new, old: jnp.where(failed | result.failed, old, new),
            result.state.model, model,
        )
        failed = jnp.logical_or(failed, result.failed)
    return model


def main():
    config = tracker_mod.TrackerConfig(height=H, width=W, nb_levels=6, candidate_cap=4096)
    seq = synthetic.generate_sequence(nb_frames=2, height=H, width=W, seed=0, motion_scale=0.008)
    pyr_fn = jax.jit(lambda i: pyramid_ops.mean_pyramid(6, i))
    pyr0 = pyr_fn(jnp.asarray(seq.grays[0]))
    kf = jax.jit(
        lambda d, p: tracker_mod.precompute_keyframe(config, seq.intrinsics, d, p)
    )(jnp.asarray(seq.depths[0]), pyr0)
    pyr1 = pyr_fn(jnp.asarray(seq.grays[1]))
    jax.block_until_ready(kf.levels[0].jacobians)
    ident = pose_mod.identity()

    policies = {
        "uniform onehot": ["onehot"] * 6,
        "uniform onehot_weighted": ["onehot_weighted"] * 6,
        "uniform gather": ["gather"] * 6,
        "gather@L0, onehot coarse": ["gather"] + ["onehot"] * 5,
        "gather@L0-1, onehot coarse": ["gather"] * 2 + ["onehot"] * 4,
        "onehot@L0, gather coarse": ["onehot"] + ["gather"] * 5,
    }

    for name, methods in policies.items():
        @jax.jit
        def run(pyr1):
            def body(carry, i):
                m = track_with_policy(
                    config, kf, pyr1,
                    pose_mod.Pose(ident.q + carry * 1e-20, ident.t), methods,
                )
                return carry + m.t.sum() * 1e-20, 0.0
            tot, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(K))
            return tot

        out = run(pyr1); jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t = time.perf_counter(); out = run(pyr1); jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t)
        print(f"{name:32s} {best / K * 1e3:8.2f} ms/frame  ({K / best:.1f} fps in-graph)")


if __name__ == "__main__":
    main()
