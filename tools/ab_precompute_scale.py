"""DEPRECATED round 4: this harness carries only a scalar through the
measurement scan, so XLA dead-code-eliminates most of each stage and the
numbers under-measure ~2x (docs/PERF.md "round-4 correction").  Use
tools/ab_precompute_stages.py (full-output carry) instead.  Kept for the
history of the round-4 diagnosis.

In-graph scaling curve of the batched keyframe precompute: cost vs lane
count K, plus a stage breakdown at chosen Ks.

The round-3 K sweep (tools/ab_subbatch.py) showed strong SUB-linearity:
P(8) ~ 21 ms vs P(32) ~ 27 ms implied from step times — i.e. a large
lane-count-independent component.  This tool measures P(K) directly
IN-GRAPH (the op under test runs N times inside one ``lax.scan`` with a
data dependency; per-dispatch wall timing over the axon tunnel is
unreliable, docs/PERF.md methodology note), and breaks the cost into
stages to locate the fixed component.

Run on the attached TPU:  python tools/ab_precompute_scale.py
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core import inverse_depth as idepth_mod
from visual_odometry_rs_tpu.core.candidates import coarse_to_fine
from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.ops import gradient as gradient_ops
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops

N_ITER = 8


def in_graph_ms(fn, args, reduce_out, n=N_ITER):
    """Cost of ``fn(*args)`` averaged over ``n`` sequential in-graph runs.

    The scan carry is a f32 scalar folded into the first argument so the
    compiler cannot hoist or CSE the body; cost = one-dispatch wall / n.
    """

    def body(c, _):
        perturbed = (args[0] + c.astype(args[0].dtype),) + args[1:]
        out = fn(*perturbed)
        return reduce_out(out) * 0.0, None

    run = jax.jit(lambda: jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                                       None, length=n)[0])
    jax.block_until_ready(run())  # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    return (time.perf_counter() - t0) * 1e3 / n


def main() -> int:
    H, W = 480, 640
    config = tracker_mod.TrackerConfig(
        height=H, width=W, nb_levels=6, candidate_cap=4096
    )
    seq = synthetic.generate_sequence(nb_frames=1, height=H, width=W, seed=0)
    intr = seq.intrinsics
    rng = np.random.default_rng(0)

    ks = [int(k) for k in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    for K in ks:
        depth = jnp.asarray(
            np.broadcast_to(np.asarray(seq.depths[0]), (K, H, W)).copy()
        )
        img = jnp.asarray(
            np.broadcast_to(np.asarray(seq.grays[0]), (K, H, W)).copy()
        )
        pyrs = jax.jit(
            jax.vmap(lambda i: pyramid_ops.mean_pyramid(config.nb_levels, i))
        )(img)

        def full(d, *p):
            return jax.vmap(
                lambda d1, *p1: tracker_mod.precompute_keyframe(
                    config, intr, d1, list(p1)
                )
            )(d, *p)

        ms = in_graph_ms(
            full, (depth,) + tuple(pyrs),
            lambda kf: kf.levels[0].idepth.sum(),
        )
        print(json.dumps({"stage": "precompute_full", "lanes": K,
                          "ms": round(ms, 2)}), flush=True)

        # stage breakdown (each stage includes its predecessors; deltas are
        # the per-stage costs — same shape as tools/profile_precompute.py but
        # measured in-graph)
        def upto_select(d, *p):
            def one(*p1):
                grads = tracker_mod._keyframe_gradients(list(p1))
                sqn = [gradient_ops.squared_norm(gx, gy) for gx, gy in grads]
                return coarse_to_fine.select(
                    config.candidates_diff_threshold, sqn
                )[-1]

            return jax.vmap(one)(*p)

        ms_sel = in_graph_ms(
            upto_select, (depth,) + tuple(pyrs),
            lambda m: m.sum().astype(jnp.float32),
        )
        print(json.dumps({"stage": "grad+select", "lanes": K,
                          "ms": round(ms_sel, 2)}), flush=True)

        def upto_idepth(d, *p):
            def one(d1, *p1):
                grads = tracker_mod._keyframe_gradients(list(p1))
                sqn = [gradient_ops.squared_norm(gx, gy) for gx, gy in grads]
                mask = coarse_to_fine.select(
                    config.candidates_diff_threshold, sqn
                )[-1]
                id0 = idepth_mod.masked(
                    idepth_mod.from_depth(
                        config.depth_scale, d1, config.idepth_variance
                    ),
                    mask,
                )
                lv = idepth_mod.pyramid(
                    id0, config.nb_levels, strategy="dso_mean"
                )
                return sum(m.idepth.sum() for m in lv)

            return jax.vmap(one)(d, *p)

        ms_id = in_graph_ms(
            upto_idepth, (depth,) + tuple(pyrs), lambda x: x.sum()
        )
        print(json.dumps({"stage": "grad+select+idepth", "lanes": K,
                          "ms": round(ms_id, 2)}), flush=True)

        # level-0 extraction alone (the dominant level)
        def extract0(d, *p):
            def one(d1, *p1):
                grads = tracker_mod._keyframe_gradients(list(p1))
                sqn = [gradient_ops.squared_norm(gx, gy) for gx, gy in grads]
                mask = coarse_to_fine.select(
                    config.candidates_diff_threshold, sqn
                )[-1]
                id0 = idepth_mod.masked(
                    idepth_mod.from_depth(
                        config.depth_scale, d1, config.idepth_variance
                    ),
                    mask,
                )
                xs, ys, z, valid, gu, gv, tv = tracker_mod._extract_level_onehot(
                    id0, grads[0][0], grads[0][1], p1[0],
                    config.level_caps()[0],
                    depth_u16=d1, depth_scale=config.depth_scale,
                )
                return z.sum() + gu.sum() + tv.sum()

            return jax.vmap(one)(d, *p)

        ms_ex0 = in_graph_ms(
            extract0, (depth,) + tuple(pyrs), lambda x: x.sum()
        )
        print(json.dumps({"stage": "grad+select+extractL0", "lanes": K,
                          "ms": round(ms_ex0, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
