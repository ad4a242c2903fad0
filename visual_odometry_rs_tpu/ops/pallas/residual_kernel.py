"""Fused Pallas TPU kernel for the tracker's LM hot loop — RETIRED reference.

STATUS: retired as a production path (round 2).  Honest scan-amortized A/B
against the XLA one-hot evaluation at level 0 (N=4096, 480x640, TPU v5e)
measures 0.875-0.906 ms/eval for this kernel (TILE 256/512/1024) vs
0.847 ms for ``_eval_full(..., "onehot")`` — the MXU work of the one-hot
formulation is identical in both, and XLA's single large fused matmul beats
the kernel's per-tile matmuls by 3-7%.  Kept as (a) a correctness-tested
reference for the fused warp+sample+reduce data path and (b) the starting
point if a future Mosaic adds efficient dynamic VMEM gathers (which would
remove the 2NHW one-hot MACs entirely — the banded-gather attempt hit
Mosaic lowering limits, see docs/PERF.md).  No production code path routes
here; ``interp_method="pallas"`` must be requested explicitly and raises
when combined with robust/brightness options.

One LM iteration's entire data path — se3 warp of the candidate points,
bilinear sampling of the current image, residuals, and the masked
normal-equation reductions ``[H | g] = (J·m)ᵀ[J | r]``, ``Σr²``, ``Σm`` —
fused into a single kernel (the reference's two hot loops,
lm_optimizer.rs:68-87 and :90-107).

Why a kernel: the XLA one-hot formulation materializes the (N, H) row and
(N, W) column selection matrices in HBM (~22 MB per iteration at level 0).
Here the image level lives in VMEM for the whole kernel, the one-hot tiles
are built and consumed in VMEM per point tile, and only the candidate arrays
and an (8, 128) accumulator touch HBM.

Mosaic-friendly structure: candidate data is laid out (TILE, 1) so every
intermediate is 2D; all scalar reductions (Σr², Σmask) are folded into the
single (8, TILE)x(TILE, 8) MXU contraction as extra columns — the kernel has
no vector reductions at all except the per-point lane reduction of the
bilinear product.  Grid programs sequentially revisit one accumulator block
(TPU grid order makes += safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.types import Float

TILE = 256
# packed scalar params layout (SMEM):
# [qw qx qy qz tx ty tz cx cy fx fy skew]
_N_PARAMS = 12


def _kernel(params_ref, xs_ref, ys_ref, z_ref, tmpl_ref, valid_ref, jac_ref,
            img_ref, out_ref, *, exact_bf16: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qw = params_ref[0, 0]
    qx = params_ref[0, 1]
    qy = params_ref[0, 2]
    qz = params_ref[0, 3]
    tx = params_ref[0, 4]
    ty = params_ref[0, 5]
    tz = params_ref[0, 6]
    cx = params_ref[0, 7]
    cy = params_ref[0, 8]
    fx = params_ref[0, 9]
    fy = params_ref[0, 10]
    skew = params_ref[0, 11]

    xs = xs_ref[:]  # (TILE, 1)
    ys = ys_ref[:]
    z = z_ref[:]
    tmpl = tmpl_ref[:]
    valid = valid_ref[:] > 0.5

    # --- warp: back-project, rotate+translate, project (camera.rs:126-140,
    # lm_optimizer.rs:213-219); all (TILE, 1) --------------------------------
    depth = 1.0 / z
    py = (ys - cy) * depth / fy
    px = ((xs - cx) * depth - skew * py) / fx
    pz = depth
    # quaternion rotation via the cross-product form (pose.quat_rotate)
    tvx = 2.0 * (qy * pz - qz * py)
    tvy = 2.0 * (qz * px - qx * pz)
    tvz = 2.0 * (qx * py - qy * px)
    rx = px + qw * tvx + (qy * tvz - qz * tvy) + tx
    ry = py + qw * tvy + (qz * tvx - qx * tvz) + ty
    rz = pz + qw * tvz + (qx * tvy - qy * tvx) + tz
    u = (fx * rx + skew * ry + cx * rz) / rz
    v = (fy * ry + cy * rz) / rz

    # --- bilinear sample via in-VMEM one-hot matmuls ------------------------
    height, width = img_ref.shape
    uf = jnp.floor(u)
    vf = jnp.floor(v)
    # NaN/Inf coords (e.g. padding candidates with idepth 0) compare False
    inside = (uf >= 0.0) & (uf < width - 2) & (vf >= 0.0) & (vf < height - 2) & valid
    # sanitize: outside/invalid points sample pixel (0, 0) with weight 0 so no
    # NaN can leak through the mask (NaN * 0 == NaN)
    u0 = jnp.where(inside, jnp.clip(uf.astype(jnp.int32), 0, width - 2), 0)
    v0 = jnp.where(inside, jnp.clip(vf.astype(jnp.int32), 0, height - 2), 0)
    a = jnp.where(inside, u - uf, 0.0)
    b = jnp.where(inside, v - vf, 0.0)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, height), 1)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, width), 1)
    if exact_bf16:
        # Exact 0/1 row selectors in bf16: pixel values are u8 (exact in
        # bf16) and each output element sums exactly one nonzero product
        # into the f32 accumulator, so a default-precision bf16 MXU pass
        # gathers rows bit-exactly — ~3x cheaper than one Precision.HIGHEST
        # f32 matmul.
        img_bf16 = img_ref[:]
        sel0 = (row_idx == v0).astype(jnp.bfloat16)
        sel1 = (row_idx == v0 + 1).astype(jnp.bfloat16)
        g0 = jnp.dot(sel0, img_bf16, preferred_element_type=jnp.float32)
        g1 = jnp.dot(sel1, img_bf16, preferred_element_type=jnp.float32)
        interp_rows = (1.0 - b) * g0 + b * g1  # (TILE, W) f32 on the VPU
    else:
        # general f32 images: one weighted one-hot matmul at full precision
        rows = jnp.where(row_idx == v0, 1.0 - b, 0.0) + jnp.where(
            row_idx == v0 + 1, b, 0.0
        )
        interp_rows = jnp.dot(
            rows, img_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    cols = jnp.where(col_idx == u0, 1.0 - a, 0.0) + jnp.where(col_idx == u0 + 1, a, 0.0)
    vals = jnp.sum(interp_rows * cols, axis=1, keepdims=True)  # (TILE, 1)

    maskf = inside.astype(jnp.float32)  # (TILE, 1)
    r = jnp.where(inside, vals - tmpl, 0.0)

    # --- everything-in-one MXU contraction ----------------------------------
    # lhs cols: [J·m (6) | r | m],  rhs cols: [J (6) | r | m]
    #   m8 = lhsᵀ rhs:  m8[:6,:6] = H,  m8[:6,6] = g,
    #                   m8[6,6]  = Σr², m8[7,7]  = Σ mask
    jac = jac_ref[:]  # (TILE, 8): 6 jacobian cols + zero padding
    col8 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)
    lhs = jnp.where(col8 == 6, r, jnp.where(col8 == 7, maskf, jac * maskf))
    rhs = jnp.where(col8 == 6, r, jnp.where(col8 == 7, maskf, jac))
    m8 = jax.lax.dot_general(
        lhs, rhs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, 8)

    # widen (8, 8) -> (8, 128) with a one-hot selector matmul
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    ).astype(jnp.float32)
    out_ref[:] += jnp.dot(m8, sel, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_residual_reduce(
    image: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    idepth: jnp.ndarray,
    tmpl_vals: jnp.ndarray,
    valid: jnp.ndarray,
    jacobians: jnp.ndarray,
    pose_q: jnp.ndarray,
    pose_t: jnp.ndarray,
    intr_params: jnp.ndarray,
    interpret: bool = False,
):
    """Returns ``(m (6,7), rsq, count)`` for one LM evaluation.

    ``intr_params = [cx, cy, fx, fy, skew]``.  Candidate arrays of any length
    are padded to a multiple of TILE (padding has ``valid`` False).

    u8/i8 and bf16 images take the exact bf16 one-hot gather path; all other
    dtypes (f32, wide integers) stay f32 through a Precision.HIGHEST matmul
    so no caller silently loses precision.
    """
    exact_bf16 = (
        jnp.issubdtype(image.dtype, jnp.integer) and image.dtype.itemsize == 1
    ) or image.dtype == jnp.bfloat16
    n = xs.shape[0]
    if n % TILE != 0:
        pad = TILE - n % TILE
        xs = jnp.pad(xs, (0, pad))
        ys = jnp.pad(ys, (0, pad))
        idepth = jnp.pad(idepth, (0, pad), constant_values=1.0)
        tmpl_vals = jnp.pad(tmpl_vals, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        jacobians = jnp.pad(jacobians, ((0, pad), (0, 0)))
        n = n + pad
    num_tiles = n // TILE

    params = jnp.concatenate([pose_q, pose_t, intr_params]).astype(Float).reshape(1, _N_PARAMS)
    jac_padded = jnp.pad(jacobians.astype(Float), ((0, 0), (0, 2)))

    def col_spec():
        return pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, exact_bf16=exact_bf16),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, _N_PARAMS), lambda i: (0, 0), memory_space=pltpu.SMEM),
            col_spec(),
            col_spec(),
            col_spec(),
            col_spec(),
            col_spec(),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(image.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(
        params,
        xs.astype(Float).reshape(n, 1),
        ys.astype(Float).reshape(n, 1),
        idepth.astype(Float).reshape(n, 1),
        tmpl_vals.astype(Float).reshape(n, 1),
        valid.astype(Float).reshape(n, 1),
        jac_padded,
        image.astype(jnp.bfloat16) if exact_bf16 else image.astype(Float),
    )
    m = out[:6, :7]
    rsq = out[6, 6]
    count = out[7, 7]
    return m, rsq, count
