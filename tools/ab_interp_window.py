"""A/B the bilinear implementation inside the windowed photometric BA.

Times ``solve_window`` (F-frame window, full resolution) per interp method
in one process on the attached backend.  Companion to ``ab_interp_scan.py``
for the refinement path (``vors_refine`` defaults ride on this data).

Usage: python tools/ab_interp_window.py [--frames 4] [--cap 2048]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=4)
    parser.add_argument("--cap", type=int, default=2048)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--methods", nargs="+",
        default=["gather", "onehot", "onehot_weighted"],
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from visual_odometry_rs_tpu.dataset import synthetic
    from visual_odometry_rs_tpu.math.pose import Pose
    from visual_odometry_rs_tpu.models import photometric_ba, tracker as tracker_mod
    from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops

    height, width = 480, 640
    F = args.frames
    seq = synthetic.generate_sequence(
        nb_frames=F, height=height, width=width, seed=0, motion_scale=0.008
    )
    config = tracker_mod.TrackerConfig(
        height=height, width=width, nb_levels=6, candidate_cap=args.cap
    )
    pyr0 = pyramid_ops.mean_pyramid(config.nb_levels, jnp.asarray(seq.grays[0]))
    kf = jax.jit(
        lambda d, p: tracker_mod.precompute_keyframe(config, seq.intrinsics, d, p)
    )(jnp.asarray(seq.depths[0]), pyr0)
    images = jnp.asarray(seq.grays.astype("float32"))
    init_poses = Pose(
        jnp.stack([p.q for p in seq.poses]), jnp.stack([p.t for p in seq.poses])
    )
    win = photometric_ba.window_from_tracking(
        config, seq.intrinsics, kf.levels, images, init_poses
    )

    results = {}
    for method in args.methods:
        solve = jax.jit(
            lambda w, m=method: photometric_ba.solve_window(w, interp_method=m)
        )
        out = solve(win)
        jax.block_until_ready(out.poses.t)
        start = time.perf_counter()
        for _ in range(args.iters):
            out = solve(win)
        jax.block_until_ready(out.poses.t)
        ms = (time.perf_counter() - start) / args.iters * 1e3
        results[method] = ms
        print(f"{method}: {ms:.2f} ms/solve", file=sys.stderr)

    best = min(results, key=results.get)
    print({"results_ms": {k: round(v, 2) for k, v in results.items()}, "best": best})


if __name__ == "__main__":
    main()
