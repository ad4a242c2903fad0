"""Per-chip batching scaling curve: fused-scan throughput vs batch size.

The single-chip analog of the multi-host scaling-efficiency benchmark
(BASELINE.md's third target): how close does throughput scale with the
number of concurrent sequences on one chip?  Perfect batching would be
linear until the MXU saturates; the curve shows where that knee is.

Run:  python tools/scaling_bench.py        (runs on the attached TPU)
Prints one JSON line per batch size to stdout.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from visual_odometry_rs_tpu.dataset import synthetic
    from visual_odometry_rs_tpu.models import tracker as tracker_mod
    from visual_odometry_rs_tpu.parallel import batch as batch_mod

    h, w, F = 480, 640, 30
    seq = synthetic.generate_sequence(
        nb_frames=3, height=h, width=w, seed=0, motion_scale=0.008
    )
    config = tracker_mod.TrackerConfig(height=h, width=w, nb_levels=6, candidate_cap=4096)
    intr = seq.intrinsics
    frames = [jnp.asarray(g) for g in seq.grays[1:]]
    depth0 = jnp.asarray(seq.depths[0])
    gray0 = jnp.asarray(seq.grays[0])

    base_fps = None
    for B in (1, 2, 4, 8, 16, 32):
        depths_b = jnp.broadcast_to(depth0, (B, h, w))
        grays_b = jnp.broadcast_to(gray0, (B, h, w))
        state = jax.jit(
            lambda d, g: batch_mod.batched_init_state(config, intr, d, g)
        )(depths_b, grays_b)
        clip_d = jnp.broadcast_to(depth0, (F, B, h, w))
        clip_g = jnp.stack(
            [jnp.broadcast_to(frames[i % len(frames)], (B, h, w)) for i in range(F)]
        )

        @jax.jit
        def run_clip(s, dd, gg):
            return batch_mod.batched_track_sequence(config, intr, s, dd, gg)

        final, (_, diags) = run_clip(state, clip_d, clip_g)
        jax.block_until_ready(final.current_pose.t)
        assert not bool(diags.failed.any())
        n = 4
        t0 = time.perf_counter()
        for _ in range(n):
            final, _ = run_clip(state, clip_d, clip_g)
        jax.block_until_ready(final.current_pose.t)
        fps = n * F * B / (time.perf_counter() - t0)
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * B)
        print(
            json.dumps(
                {"batch": B, "fps_per_chip": round(fps, 1),
                 "scaling_efficiency_vs_b1": round(eff, 3)}
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
