"""A/B the keyframe-precompute variants with the honest full-carry harness.

Variants (cumulative production candidates):
    m128   production as of round 4: fused-lrank single one-hot matmul,
           extraction chunk 128
    m256   extraction chunk 256: halves the (cap, n_chunks) one-hot /
           compare intermediates (the measured extract bandwidth cost);
           within-chunk ranks <= 256 stay exact in bf16

Prints full-precompute ms at B=32 production shapes for each.

Run on the attached TPU:  python tools/ab_extract_variants.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

from visual_odometry_rs_tpu.dataset import synthetic
from visual_odometry_rs_tpu.models import tracker as tracker_mod
from visual_odometry_rs_tpu.ops import pyramid as pyramid_ops

from ab_precompute_stages import honest_ms  # noqa: E402


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

    for m in (128, 256):
        tracker_mod._EXTRACT_CHUNK = m
        ms = honest_ms(full, depth, pyrs)
        print(json.dumps({"variant": f"m{m}", "lanes": B,
                          "ms": round(ms, 2)}), flush=True)
    tracker_mod._EXTRACT_CHUNK = 128
    return 0


if __name__ == "__main__":
    sys.exit(main())
