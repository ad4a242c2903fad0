"""Same-process factor A/B of the round-4 precompute rewrites.

Cross-process decompose runs disagreed (P_all 19.8 vs 23.5 ms) — this
tool measures the full vmapped precompute (honest full-carry harness) at
B=32 under monkeypatched combinations of the two candidate factors:

    merge:  new (broadcast-upsample + parity select)  vs  old (.at[::2].set)
    grads:  new (f32 carriers)                        vs  old (i16/i32)

Run on the attached TPU:  python tools/ab_variants2.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from visual_odometry_rs_tpu.core.candidates import coarse_to_fine
from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.ops import gradient as gradient_ops
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops

from ab_precompute_stages import honest_ms  # noqa: E402

merge_new = coarse_to_fine._merge_block_masks
grads_new = tracker_mod._keyframe_gradients


def merge_old(ka, kb, kc, kd):
    h2, w2 = ka.shape[-2:]
    out = jnp.zeros((*ka.shape[:-2], 2 * h2, 2 * w2), dtype=bool)
    out = out.at[..., 0::2, 0::2].set(ka)
    out = out.at[..., 1::2, 0::2].set(kb)
    out = out.at[..., 0::2, 1::2].set(kc)
    out = out.at[..., 1::2, 1::2].set(kd)
    return out


def grads_old(img_pyramid):
    # integer arithmetic as before round 4, cast to f32 at the boundary so
    # the (now f32) downstream consumers are identical — isolates the
    # integer-op cost question
    grads = [gradient_ops.centered(img_pyramid[0])]
    grads.extend(gradient_ops.gradients_xy(img_pyramid))
    return [(gx.astype(jnp.float32), gy.astype(jnp.float32)) for gx, gy in grads]


def main() -> int:
    H, W, B = 480, 640, 32
    config = tracker_mod.TrackerConfig(
        height=H, width=W, nb_levels=6, candidate_cap=4096
    )
    seq = synthetic.generate_sequence(nb_frames=1, height=H, width=W, seed=0)
    intr = seq.intrinsics
    depth = jnp.asarray(
        np.broadcast_to(np.asarray(seq.depths[0]), (B, H, W)).copy()
    )
    img = jnp.asarray(
        np.broadcast_to(np.asarray(seq.grays[0]), (B, H, W)).copy()
    )
    pyrs = list(jax.jit(
        jax.vmap(lambda i: pyramid_ops.mean_pyramid(config.nb_levels, i))
    )(img))

    def full(d, p):
        return jax.vmap(
            lambda d1, *p1: tracker_mod.precompute_keyframe(
                config, intr, d1, list(p1)
            )
        )(d, *p)

    for mname, mfn in (("mergeNew", merge_new), ("mergeOld", merge_old)):
        for gname, gfn in (("gradsF32", grads_new), ("gradsI16", grads_old)):
            coarse_to_fine._merge_block_masks = mfn
            tracker_mod._keyframe_gradients = gfn
            ms = honest_ms(full, depth, pyrs)
            print(json.dumps({"variant": f"{mname}+{gname}",
                              "ms": round(ms, 2)}), flush=True)
    coarse_to_fine._merge_block_masks = merge_new
    tracker_mod._keyframe_gradients = grads_new
    return 0


if __name__ == "__main__":
    sys.exit(main())
