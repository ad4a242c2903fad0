"""Same-process A/B: per-level warp-Jacobian calls vs one stacked call.

The staged breakdown attributes ~1-3 ms (B=32) to the six per-level
``warp_jacobian`` chains — tiny data, pure dispatch overhead.  Variant
``stacked`` pads every level's per-candidate vectors to the max cap,
stacks them on a leading level axis, evaluates ONE broadcast
warp_jacobian, and slices per level (numerically identical: the same
elementwise ops, broadcast over the level axis).

Run on the attached TPU:  python tools/ab_jac_stack.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

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
from visual_odometry_rs_tpu.utils.types import Float
from visual_odometry_rs_tpu.core.camera import Intrinsics

from ab_precompute_stages import honest_ms  # noqa: E402


def precompute_stacked_jac(config, intrinsics, depth_map, img_pyramid):
    """precompute_keyframe with ONE stacked warp-Jacobian evaluation."""
    nb_levels = len(img_pyramid)
    intr_levels = camera_mod.multi_res(intrinsics, nb_levels)
    grads = tracker_mod._keyframe_gradients(img_pyramid)
    sqn = [gradient_ops.squared_norm_f32(gx, gy) for gx, gy in grads]
    finest_mask = coarse_to_fine.select(config.candidates_diff_threshold, sqn)[-1]
    id0 = idepth_mod.masked(
        idepth_mod.from_depth(config.depth_scale, depth_map, config.idepth_variance),
        finest_mask,
    )
    id_levels = idepth_mod.pyramid(id0, nb_levels, strategy="dso_mean")

    caps = config.level_caps()
    maxcap = max(caps)
    outs = []
    for lvl in range(nb_levels):
        gx, gy = grads[lvl]
        outs.append(tracker_mod._extract_level_onehot(
            id_levels[lvl], gx, gy, img_pyramid[lvl], caps[lvl],
            depth_u16=depth_map
            if lvl == 0 and depth_map.dtype == jnp.uint16 else None,
            depth_scale=config.depth_scale,
        ))

    def padstack(i):
        return jnp.stack([
            jnp.pad(o[i], (0, maxcap - o[i].shape[0])) for o in outs
        ])

    xs_s, ys_s, z_s, gu_s, gv_s = (padstack(i) for i in (0, 1, 2, 4, 5))
    k_s = Intrinsics(*(
        jnp.stack([jnp.asarray(getattr(k, f), Float) for k in intr_levels])[:, None]
        for f in ("cx", "cy", "fx", "fy", "skew")
    ))
    jac_s = tracker_mod.warp_jacobian(gu_s, gv_s, xs_s, ys_s, z_s, k_s)

    levels = []
    for lvl in range(nb_levels):
        xs, ys, z, valid, gu, gv, tmpl_vals = outs[lvl]
        jac = jnp.where(valid[:, None], jac_s[lvl, : caps[lvl]], 0.0)
        levels.append(tracker_mod.LevelObs(
            intrinsics=intr_levels[lvl], template=img_pyramid[lvl],
            xs=xs, ys=ys, idepth=z, valid=valid, tmpl_vals=tmpl_vals,
            jacobians=jac,
        ))
    return tracker_mod.KeyframeData(levels=tuple(levels))


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

    def full_cur(d, p):
        return jax.vmap(
            lambda d1, *p1: tracker_mod.precompute_keyframe(
                config, intr, d1, list(p1))
        )(d, *p)

    def full_stk(d, p):
        return jax.vmap(
            lambda d1, *p1: precompute_stacked_jac(config, intr, d1, list(p1))
        )(d, *p)

    # bit-exactness first (CPU-independent: same device)
    a = jax.jit(full_cur)(depth[:1], [p[:1] for p in pyrs])
    b = jax.jit(full_stk)(depth[:1], [p[:1] for p in pyrs])
    for la, lb in zip(a.levels, b.levels):
        np.testing.assert_array_equal(np.asarray(la.jacobians), np.asarray(lb.jacobians))
    print(json.dumps({"check": "stacked jac bit-exact"}), flush=True)

    for name, fn in (("current", full_cur), ("stacked", full_stk)):
        ms = honest_ms(fn, depth, pyrs)
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
