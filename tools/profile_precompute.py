"""Stage-level timing of the batched keyframe precompute on TPU.

The diverse-batch benchmark showed the batch-32 precompute dominating
switch-heavy serving (~69 ms vs ~9 ms for a full frame solve).  This tool
times each stage of ``precompute_keyframe`` under vmap to find the payer.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core import camera as camera_mod
from visual_odometry_rs_tpu.core import inverse_depth as idepth_mod
from visual_odometry_rs_tpu.core.candidates import coarse_to_fine
from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.ops import gradient as gradient_ops
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops


def timeit(label, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / n
    print(f"{label:42s} {dt * 1e3:8.2f} ms")
    return out


def main():
    H, W, B = 480, 640, 32
    config = tracker_mod.TrackerConfig(height=H, width=W, nb_levels=6, candidate_cap=4096)
    seq = synthetic.generate_sequence(nb_frames=1, height=H, width=W, seed=0)
    intr = seq.intrinsics
    depth = jnp.broadcast_to(jnp.asarray(seq.depths[0]), (B, H, W))
    img = jnp.broadcast_to(jnp.asarray(seq.grays[0]), (B, H, W))

    pyr_fn = jax.jit(jax.vmap(lambda i: pyramid_ops.mean_pyramid(config.nb_levels, i)))
    pyrs = timeit("mean_pyramid", pyr_fn, img)

    full = jax.jit(
        jax.vmap(
            lambda d, *p: tracker_mod.precompute_keyframe(config, intr, d, list(p))
        )
    )
    timeit("precompute_keyframe (full)", full, depth, *pyrs)

    grads_fn = jax.jit(jax.vmap(lambda *p: tracker_mod._keyframe_gradients(list(p))))
    grads = timeit("gradients", grads_fn, *pyrs)

    def sqn_stage(*p):
        g = tracker_mod._keyframe_gradients(list(p))
        return [gradient_ops.squared_norm(gx, gy) for gx, gy in g]

    sqn_fn = jax.jit(jax.vmap(sqn_stage))
    sqn = timeit("gradients+sqnorm", sqn_fn, *pyrs)

    def select_stage(*p):
        s = sqn_stage(*p)
        return coarse_to_fine.select(config.candidates_diff_threshold, s)[-1]

    sel_fn = jax.jit(jax.vmap(select_stage))
    timeit("... + c2f select", sel_fn, *pyrs)

    def idepth_stage(d, *p):
        mask = select_stage(*p)
        id0 = idepth_mod.masked(
            idepth_mod.from_depth(config.depth_scale, d, config.idepth_variance), mask
        )
        lv = idepth_mod.pyramid(id0, config.nb_levels, strategy="dso_mean")
        return [m.idepth for m in lv]

    id_fn = jax.jit(jax.vmap(idepth_stage))
    timeit("... + idepth pyramid", id_fn, depth, *pyrs)

    # candidate extraction alone, per level
    caps = config.level_caps()
    id_levels_fn = jax.jit(jax.vmap(idepth_stage))

    def extract_stage(d, *p):
        mask = select_stage(*p)
        id0 = idepth_mod.masked(
            idepth_mod.from_depth(config.depth_scale, d, config.idepth_variance), mask
        )
        lv = idepth_mod.pyramid(id0, config.nb_levels, strategy="dso_mean")
        outs = []
        for m, cap in zip(lv, caps):
            outs.append(tracker_mod._extract_candidates(m, cap))
        return outs

    ex_fn = jax.jit(jax.vmap(extract_stage))
    timeit("... + extract_candidates (all levels)", ex_fn, depth, *pyrs)

    # single-level extraction at full res
    def extract_l0(d, *p):
        mask = select_stage(*p)
        id0 = idepth_mod.masked(
            idepth_mod.from_depth(config.depth_scale, d, config.idepth_variance), mask
        )
        return tracker_mod._extract_candidates(id0, caps[0])

    ex0_fn = jax.jit(jax.vmap(extract_l0))
    timeit("... + extract level-0 only", ex0_fn, depth, *pyrs)


if __name__ == "__main__":
    main()
