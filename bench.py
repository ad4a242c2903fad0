"""Benchmark: tracker frames/s per chip on synthetic 640x480 RGB-D sequences.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline note: the reference (Rust vors_track) publishes no numbers and this
image has no Rust toolchain to measure it (BASELINE.md).  We use an estimated
reference throughput of 30 frames/s for a release-mode single-core run of a
DSO-style direct RGB-D tracker at 640x480 — the same order as published
direct-VO CPU trackers — and report vs_baseline against that documented
estimate.  BASELINE.md also records a *measured* floor (the in-repo scalar
Python oracle).  The driver records results per round for trend tracking.

Methodology: steady-state tracking cost — mean-pyramid build + full 6-level
coarse-to-fine LM solve + optical-flow keyframe logic per frame, after a
warmup compile, with device completion blocking.  The headline metric is the
production serving mode measured HONESTLY: a batch of 32 *diverse* sequences
(distinct textures, distinct motion profiles, so keyframe switches
desynchronize across lanes and the scan-level precompute cond fires
realistically often), with the frame loop fused into the XLA program via
``lax.scan`` (``parallel.batch.batched_track_sequence``) so a whole clip is
ONE device dispatch.  Secondary metrics go to stderr under STABLE keys (one
metric name per methodology — never compare across keys):

  fps_single_stream . per-frame dispatch, one sequence
  fps_step_b8_broadcast . per-frame dispatch, 8 identical lanes (legacy)
  fps_scan_b32_broadcast . fused scan, 32 identical lanes (flatters the
      switch cond: lockstep switches — kept only for round-over-round trend)
  fps_scan_b32_diverse . fused scan, 32 diverse lanes, all-lanes precompute
  fps_scan_b32_diverse_subbatch8 . same semantics, sub-batch switch-lane
      compaction (switch_subbatch=8 = B/4, the measured TPU optimum of the
      K sweep recorded in docs/PERF.md: only the pending lanes precompute,
      compacted into a fixed 8-lane sub-batch; >8 pending falls back to
      all-lanes — reference-exact cadence-1 switching either way.  Rounds
      1-3 briefly reported a subbatch4 key; K=4 predates the sweep and
      mostly hit the fallback, so that key is retired)
  fps_scan_b32_diverse_cadence4 . + switch-cadence batching (switches
      executed on every 4th frame; a documented semantics tradeoff,
      see parallel/batch.py)
  fps_scan_b64_diverse_subbatch16 . the round-5 lane-scaling row: 64
      diverse lanes, cadence 1, switch_subbatch=16 (K=B/4) — same
      reference-exact semantics, more lanes per chip.  The round-5 lane
      sweep (tools/ab_lanes.py, docs/PERF.md) measured throughput/chip
      scaling with B well past 32 (B=64 +23%, B=128 +33% over B=32
      same-process), bought with per-step latency (24 -> 39 -> 68 ms)

The HEADLINE key measures "diverse cadence-1 fps/chip with the best
available serving configuration" — the max over the cadence-1 rows
(B=32 all-lanes, B=32 subbatch-8, and from round 5 B=64 subbatch-16;
identical reference-exact per-lane semantics and workload — the
sub-batch precompute and the lane count are serving-config choices like
interp "auto").  METHODOLOGY NOTE for trend readers: rounds 1-4
reported the B=32-restricted max under the metric name
``tracker_fps_chip_640x480_scan_b32_diverse_cap4096``; round 5 renames
the metric to ``..._scan_diverse_cap4096`` (no pinned B) because the
lane sweep showed B=32 underutilizes the chip — the quantity (diverse
cadence-1 fps/chip at cap 4096) is unchanged and the chosen variant is
recorded in the JSON.  Every raw row stays on stderr under its own
stable key, so cross-round comparisons of a single configuration should
use those; the within-process max adds far less than the documented
±20% cross-process tunnel variance.
  mean_pyramid_ms . 6-level u8 mean pyramid of one 640x480 frame
      (the reference's only bench harness, benches/mean_pyramid.rs)

All fps numbers are at candidate capacity 4096 (sized to the reference's own
workload: its 4-level example selects ~2.6k finest-level points,
examples/README.md:72; TUM fr1 keyframes land in the same range).
"""

from __future__ import annotations

import json
import sys
import time


REFERENCE_FPS_ESTIMATE = 30.0  # documented estimate, see module docstring


def _timeit(fn, block, n):
    fn()  # warmup (compile)
    block()
    start = time.perf_counter()
    for _ in range(n):
        out = fn()
    block()
    return out, (time.perf_counter() - start) / n


def main() -> None:
    import os
    import pathlib

    import jax

    # persistent XLA compilation cache: the driver re-runs this benchmark
    # every round; caching the (identical) programs cuts minutes of TPU
    # compile time per run (cache dir is gitignored)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from visual_odometry_rs_tpu.dataset import synthetic
    from visual_odometry_rs_tpu.math import pose as pose_mod
    from visual_odometry_rs_tpu.models import tracker as tracker_mod
    from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops
    from visual_odometry_rs_tpu.parallel import batch as batch_mod

    height, width = 480, 640
    B, F = 32, 10
    config = tracker_mod.TrackerConfig(
        height=height, width=width, nb_levels=6, candidate_cap=4096
    )

    # --- data: one base sequence + 32 diverse sequences -------------------
    # host-side rendering of 300+ full-res frames costs ~10 min; cache the
    # arrays on disk (gitignored, version-keyed) so driver re-runs are fast
    t_gen = time.perf_counter()
    base = synthetic.generate_sequence(
        nb_frames=3, height=height, width=width, seed=0, motion_scale=0.008
    )
    intrinsics = base.intrinsics
    cache_file = os.path.join(cache_dir, f"diverse_v2_{B}x{F}_{height}x{width}.npz")
    if os.path.exists(cache_file):
        data = np.load(cache_file)
        div_grays, div_depths = data["grays"], data["depths"]
    else:
        rng = np.random.default_rng(42)
        seqs = []
        for lane in range(B):
            # magnitude ladder 0.004..0.04 m/frame + per-lane direction and
            # rotation, distinct textures: switches desynchronize across lanes
            mag = 0.004 + 0.036 * lane / (B - 1)
            direction = rng.normal(size=3)
            direction = mag * direction / np.linalg.norm(direction)
            rot = 0.002 * rng.normal(size=3)
            seqs.append(
                synthetic.generate_sequence(
                    nb_frames=F + 1, height=height, width=width, seed=100 + lane,
                    intrinsics=intrinsics,
                    twist_per_frame=np.concatenate([direction, rot]),
                )
            )
        div_grays = np.stack([s.grays for s in seqs])  # (B, F+1, H, W)
        div_depths = np.stack([s.depths for s in seqs])
        os.makedirs(cache_dir, exist_ok=True)
        np.savez_compressed(cache_file, grays=div_grays, depths=div_depths)
    print(f"data generation: {time.perf_counter() - t_gen:.1f}s", file=sys.stderr)

    # --- mean-pyramid micro-bench (benches/mean_pyramid.rs parity row) ----
    img0 = jnp.asarray(base.grays[0])
    pyr_fn = jax.jit(lambda i: pyramid_ops.mean_pyramid(config.nb_levels, i))
    out, dt = _timeit(
        lambda: pyr_fn(img0), lambda: jax.block_until_ready(pyr_fn(img0)[-1]), 50
    )
    print(f"mean_pyramid_ms: {dt * 1e3:.3f}", file=sys.stderr)

    # --- single-stream per-frame dispatch ---------------------------------
    @jax.jit
    def per_frame(kf, img, init_model):
        pyr = pyramid_ops.mean_pyramid(config.nb_levels, img)
        result = tracker_mod.track_frame(config, kf, pyr, init_model)
        return result.model, result.flow, result.failed

    depth0 = jnp.asarray(base.depths[0])
    pyr0 = pyr_fn(img0)
    kf = jax.jit(
        lambda d, p: tracker_mod.precompute_keyframe(config, intrinsics, d, p)
    )(depth0, pyr0)
    jax.block_until_ready(kf.levels[0].jacobians)
    frames = [jnp.asarray(g) for g in base.grays[1:]]
    ident = pose_mod.identity()

    model, flow, failed = per_frame(kf, frames[0], ident)
    jax.block_until_ready(model.t)
    assert not bool(failed), "benchmark track failed"
    n_iters = 30
    start = time.perf_counter()
    for i in range(n_iters):
        model, flow, failed = per_frame(kf, frames[i % len(frames)], ident)
    jax.block_until_ready(model.t)
    single_fps = n_iters / (time.perf_counter() - start)
    print(f"fps_single_stream: {single_fps:.2f}", file=sys.stderr)

    # --- batched per-step (8 identical lanes; legacy comparison key) ------
    B8 = 8
    kfb = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B8, *x.shape)), kf)
    imgs8 = jnp.broadcast_to(frames[0], (B8, height, width))
    models8 = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B8, *x.shape)), ident)

    @jax.jit
    def per_frame_batched(kfb, imgs, models):
        def one(kf1, img1, m1):
            pyr = pyramid_ops.mean_pyramid(config.nb_levels, img1)
            r = tracker_mod.track_frame(config, kf1, pyr, m1)
            return r.model, r.failed

        return jax.vmap(one)(kfb, imgs, models)

    out = per_frame_batched(kfb, imgs8, models8)
    jax.block_until_ready(out[0].t)
    assert not bool(out[1].any()), "batched benchmark track failed"
    start = time.perf_counter()
    for _ in range(n_iters):
        out = per_frame_batched(kfb, imgs8, models8)
    jax.block_until_ready(out[0].t)
    step_fps = n_iters * B8 / (time.perf_counter() - start)
    print(f"fps_step_b8_broadcast: {step_fps:.2f}", file=sys.stderr)

    # --- fused scan, broadcast (legacy trend key; flatters the cond) ------
    depths_b = jnp.broadcast_to(depth0, (B, height, width))
    grays_b = jnp.broadcast_to(img0, (B, height, width))
    state_bcast = jax.jit(
        lambda d, g: batch_mod.batched_init_state(config, intrinsics, d, g)
    )(depths_b, grays_b)
    clip_d_bcast = jnp.broadcast_to(depth0, (F, B, height, width))
    clip_g_bcast = jnp.stack(
        [jnp.broadcast_to(frames[i % len(frames)], (B, height, width)) for i in range(F)]
    )

    def scan_fps(state, clip_d, clip_g, cadence, label, subbatch=0, cfg=None):
        cfg = config if cfg is None else cfg
        run = jax.jit(
            lambda s, dd, gg: batch_mod.batched_track_sequence(
                cfg, intrinsics, s, dd, gg, switch_cadence=cadence,
                switch_subbatch=subbatch,
            )
        )
        final, (poses, diags) = run(state, clip_d, clip_g)
        jax.block_until_ready(final.current_pose.t)
        assert not bool(diags.failed.any()), f"{label}: track failed"
        n_clips = 3
        lanes = clip_d.shape[1]
        start = time.perf_counter()
        for _ in range(n_clips):
            final, out = run(state, clip_d, clip_g)
        jax.block_until_ready(final.current_pose.t)
        fps = n_clips * F * lanes / (time.perf_counter() - start)
        switch_frames = int(jnp.asarray(out[1].switched).any(axis=1).sum())
        print(f"{label}: {fps:.2f}  (switch-frames {switch_frames}/{F})", file=sys.stderr)
        return fps

    bcast_fps = scan_fps(state_bcast, clip_d_bcast, clip_g_bcast, 1, "fps_scan_b32_broadcast")

    # --- fused scan, DIVERSE (headline) -----------------------------------
    d0 = jnp.asarray(div_depths[:, 0])
    g0 = jnp.asarray(div_grays[:, 0])
    clip_d = jnp.asarray(div_depths[:, 1:].transpose(1, 0, 2, 3))  # (F, B, H, W)
    clip_g = jnp.asarray(div_grays[:, 1:].transpose(1, 0, 2, 3))
    state_div = jax.jit(
        lambda d, g: batch_mod.batched_init_state(config, intrinsics, d, g)
    )(d0, g0)
    diverse_fps = scan_fps(state_div, clip_d, clip_g, 1, "fps_scan_b32_diverse")
    subbatch_fps = scan_fps(
        state_div, clip_d, clip_g, 1, "fps_scan_b32_diverse_subbatch8",
        subbatch=8,
    )
    cadence_fps = scan_fps(state_div, clip_d, clip_g, 4, "fps_scan_b32_diverse_cadence4")

    # --- fused scan, diverse, B=64 (round-5 lane-scaling headline row) -----
    # same reference-exact cadence-1 semantics, 64 diverse lanes (the
    # tools/ab_lanes.py ladder superset, cached), switch_subbatch=B/4=16
    from tools.ab_lanes import _superset

    lanes_g, lanes_d = _superset(
        pathlib.Path(cache_dir), height, width, F, n_lanes=64
    )
    d0_64 = jnp.asarray(lanes_d[:, 0])
    g0_64 = jnp.asarray(lanes_g[:, 0])
    clip_d64 = jnp.asarray(lanes_d[:, 1:].transpose(1, 0, 2, 3))
    clip_g64 = jnp.asarray(lanes_g[:, 1:].transpose(1, 0, 2, 3))
    state_64 = jax.jit(
        lambda d, g: batch_mod.batched_init_state(config, intrinsics, d, g)
    )(d0_64, g0_64)
    b64_fps = scan_fps(
        state_64, clip_d64, clip_g64, 1, "fps_scan_b64_diverse_subbatch16",
        subbatch=16,
    )

    # --- option-cost trend rows (NOT headline candidates) ------------------
    # product knobs at the headline operating point, so serving-cost
    # regressions are visible per round (full matrix: tools/ab_options.py;
    # opt-in warm-start study: tools/ab_warmstart.py + docs/PERF.md)
    import dataclasses

    cfg_hb = dataclasses.replace(
        config, robust_delta=10.0, brightness_model=True
    )
    state_hb = jax.jit(
        lambda d, g: batch_mod.batched_init_state(cfg_hb, intrinsics, d, g)
    )(d0, g0)
    scan_fps(
        state_hb, clip_d, clip_g, 1,
        "fps_scan_b32_diverse_subbatch8_huber_brightness",
        subbatch=8, cfg=cfg_hb,
    )
    cfg_cvb = dataclasses.replace(
        config, warm_start="constant_velocity",
        level_max_iterations=(20, 20, 10, 10, 5, 5),
    )
    state_cvb = jax.jit(
        lambda d, g: batch_mod.batched_init_state(cfg_cvb, intrinsics, d, g)
    )(d0, g0)
    scan_fps(
        state_cvb, clip_d, clip_g, 1,
        "fps_scan_b32_diverse_subbatch8_cv_budget",
        subbatch=8, cfg=cfg_cvb,
    )

    # headline: best cadence-1 serving configuration (identical
    # reference-exact per-lane switch semantics; the sub-batch precompute
    # and the lane count are serving-config choices).  The chosen variant
    # is recorded IN the JSON so trend readers can see when the headline
    # came from a different configuration than before (the raw rows stay
    # on stderr under stable keys; rounds 1-4 reported the B=32-restricted
    # max under the old ``..._scan_b32_diverse_cap4096`` metric name).
    candidates = {
        "all_lanes_b32": diverse_fps,
        "b32_subbatch8": subbatch_fps,
        "b64_subbatch16": b64_fps,
    }
    variant = max(candidates, key=candidates.get)
    headline = candidates[variant]
    print(
        json.dumps(
            {
                "metric": "tracker_fps_chip_640x480_scan_diverse_cap4096",
                "value": round(headline, 2),
                "unit": "frames/s",
                "vs_baseline": round(headline / REFERENCE_FPS_ESTIMATE, 3),
                "variant": variant,
            }
        )
    )


if __name__ == "__main__":
    main()
