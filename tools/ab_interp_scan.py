"""A/B the bilinear implementation inside the fused batch scan, one process.

Runs ``batched_track_sequence`` (the bench.py headline path: B sequences x
F frames, one dispatch per clip) once per interp method on the attached
backend and prints fps side by side.  Tunnel variance between *processes* is
+-20%, so within-process A/B is the only trustworthy comparison
(docs/PERF.md).

Usage: python tools/ab_interp_scan.py [--batch 32] [--frames 30] [--cap 4096]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--cap", type=int, default=4096)
    parser.add_argument("--clips", type=int, default=4)
    parser.add_argument(
        "--methods", nargs="+", default=["onehot", "onehot_weighted"]
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from visual_odometry_rs_tpu.dataset import synthetic
    from visual_odometry_rs_tpu.models import tracker as tracker_mod
    from visual_odometry_rs_tpu.parallel import batch as batch_mod

    height, width = 480, 640
    seq = synthetic.generate_sequence(
        nb_frames=3, height=height, width=width, seed=0, motion_scale=0.008
    )
    B, F = args.batch, args.frames
    depth0 = jnp.asarray(seq.depths[0])
    frames = [jnp.asarray(g) for g in seq.grays[1:]]
    depths_b = jnp.broadcast_to(depth0, (B, height, width))
    grays_b = jnp.broadcast_to(jnp.asarray(seq.grays[0]), (B, height, width))
    clip_d = jnp.broadcast_to(depth0, (F, B, height, width))
    clip_g = jnp.stack(
        [jnp.broadcast_to(frames[i % len(frames)], (B, height, width)) for i in range(F)]
    )

    results = {}
    for method in args.methods:
        config = tracker_mod.TrackerConfig(
            height=height, width=width, nb_levels=6,
            candidate_cap=args.cap, interp_method=method,
        )
        state = jax.jit(
            lambda d, g, c=config: batch_mod.batched_init_state(
                c, seq.intrinsics, d, g
            )
        )(depths_b, grays_b)

        @jax.jit
        def run_clip(state, clip_d, clip_g, c=config):
            return batch_mod.batched_track_sequence(
                c, seq.intrinsics, state, clip_d, clip_g
            )

        final, (_, diags) = run_clip(state, clip_d, clip_g)
        jax.block_until_ready(final.current_pose.t)
        assert not bool(diags.failed.any()), f"{method}: track failed"
        start = time.perf_counter()
        for _ in range(args.clips):
            final, _ = run_clip(state, clip_d, clip_g)
        jax.block_until_ready(final.current_pose.t)
        fps = args.clips * F * B / (time.perf_counter() - start)
        results[method] = fps
        print(f"{method}: {fps:.1f} fps/chip", file=sys.stderr)

    best = max(results, key=results.get)
    print({"results": {k: round(v, 1) for k, v in results.items()}, "best": best})


if __name__ == "__main__":
    main()
