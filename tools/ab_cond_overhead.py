"""Isolate the per-check-frame overhead of the lazy-switch ``lax.cond``.

Round-4 decomposition (tools/ab_step_decompose.py) found the in-scan
precompute costs a fixed ~11-12 ms per taken check frame MORE than the
isolated vmapped precompute, independent of the sub-batch size K:

    P_all  in-scan 23.5 ms  vs isolated 11.0 ms  (32 lanes)
    P_sub8 in-scan 17.8 ms  vs isolated  6.7 ms  (8-lane compaction)

Candidate culprits: (a) the ``lax.cond`` copying the full B-lane
KeyframeData tree through the branch boundary, (b) the per-lane select
(tree_map where) over the full tree, (c) interaction with the tracking
computation in the same scan body.  This tool runs a scan WITHOUT tracking
whose body is only the cond machinery, in three variants:

    baseline   no cond: pyramid + tiny reduce only
    copyonly   cond taken 8/10 frames, branch = forced copy of the kf tree
               (jnp.roll by 1 lane: pure buffer traffic, no precompute)
    precomp    cond taken 8/10 frames, branch = real vmapped precompute +
               per-lane select (the production recompute path)

(precomp - baseline) / 0.8  = in-scan cost per taken check frame, to
compare against the isolated 11 ms; (copyonly - baseline) / 0.8 = the pure
tree-traffic share.

Run on the attached TPU:  python tools/ab_cond_overhead.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visual_odometry_rs_tpu.dataset import synthetic
    from visual_odometry_rs_tpu.models import tracker as tracker_mod
    from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops
    from visual_odometry_rs_tpu.parallel import batch as batch_mod

    h, w, F, B = 480, 640, 10, 32
    config = tracker_mod.TrackerConfig(
        height=h, width=w, nb_levels=6, candidate_cap=4096
    )
    config = batch_mod._resolve_batched_interp(config)
    cache_file = (
        pathlib.Path(__file__).resolve().parents[1]
        / ".bench_cache" / f"diverse_v2_{B}x{F}_{h}x{w}.npz"
    )
    base = synthetic.generate_sequence(nb_frames=1, height=h, width=w, seed=0)
    intr = base.intrinsics
    data = np.load(cache_file)
    div_grays, div_depths = data["grays"], data["depths"]

    state = jax.jit(
        lambda d, g: batch_mod.batched_init_state(config, intr, d, g)
    )(jnp.asarray(div_depths[:B, 0]), jnp.asarray(div_grays[:B, 0]))
    kf0 = state.kf
    clip_d = jnp.asarray(div_depths[:B, 1:].transpose(1, 0, 2, 3))
    clip_g = jnp.asarray(div_grays[:B, 1:].transpose(1, 0, 2, 3))
    checks = jnp.asarray((np.arange(F) % 5) < 4)  # 8/10 taken
    # a realistic pending mask: 8 of 32 lanes switch on taken frames
    mask = jnp.asarray(np.arange(B) % 4 == 0)

    def bcast(flag, like):
        return flag.reshape(flag.shape + (1,) * (like.ndim - flag.ndim))

    def make_run(variant):
        def body(kf, frame):
            check, d, i = frame
            pyrs = jax.vmap(
                lambda im: pyramid_ops.mean_pyramid(config.nb_levels, im)
            )(i)

            def keep(kf_old):
                return kf_old

            if variant == "baseline":
                kf2 = keep(kf)
                # consume the pyramids so they are not DCE'd
                probe = pyrs[0].sum() * 0.0
            elif variant == "copyonly":
                def copy_branch(kf_old):
                    return jax.tree_util.tree_map(
                        lambda x: jnp.roll(x, 1, axis=0), kf_old
                    )

                kf2 = jax.lax.cond(check, copy_branch, keep, kf)
                probe = pyrs[0].sum() * 0.0
            else:  # precomp: the production recompute path
                def recompute(kf_old):
                    new_kf = jax.vmap(
                        lambda d1, *p: tracker_mod.precompute_keyframe(
                            config, intr, d1, list(p)
                        )
                    )(d, *pyrs)
                    return jax.tree_util.tree_map(
                        lambda new, old: jnp.where(bcast(mask, new), new, old),
                        new_kf, kf_old,
                    )

                kf2 = jax.lax.cond(check, recompute, keep, kf)
                probe = pyrs[0].sum() * 0.0
            y = kf2.levels[0].idepth.sum() + probe
            return kf2, y

        def run(kf, cc, dd, gg):
            return jax.lax.scan(body, kf, (cc, dd, gg))

        return jax.jit(run)

    results = {}
    for variant in ("baseline", "copyonly", "precomp"):
        run = make_run(variant)
        final, ys = run(kf0, checks, clip_d, clip_g)
        jax.block_until_ready(ys)
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            final, ys = run(kf0, checks, clip_d, clip_g)
        jax.block_until_ready(ys)
        ms = (time.perf_counter() - t0) * 1e3 / (n * F)
        results[variant] = ms
        print(json.dumps({"variant": variant, "ms_per_frame": round(ms, 2)}),
              flush=True)

    per_check = lambda v: (results[v] - results["baseline"]) / 0.8
    print(json.dumps({
        "mode": "summary",
        "copy_traffic_ms_per_check": round(per_check("copyonly"), 2),
        "precomp_in_scan_ms_per_check": round(per_check("precomp"), 2),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
