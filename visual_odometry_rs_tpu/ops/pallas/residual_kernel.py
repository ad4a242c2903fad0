"""Fused Pallas TPU kernel for the tracker's LM hot loop.

One LM iteration's entire data path — se3 warp of the candidate points,
bilinear sampling of the current image, residuals, and the masked
normal-equation reductions ``[H | g] = (J·m)ᵀ[J | r]``, ``Σr²``, ``Σm`` —
fused into a single kernel (the reference's two hot loops,
lm_optimizer.rs:68-87 and :90-107).

Why a kernel: the XLA one-hot formulation materializes the (N, H) row and
(N, W) column selection matrices in HBM (~22 MB per iteration at level 0).
Here the image level lives in VMEM for the whole kernel, the one-hot tiles
are built and consumed in VMEM per 256-point tile, and only the candidate
arrays and a (8, 128)-padded accumulator touch HBM.  The two matmuls
(rows @ image on the MXU, and the (6+1)-column reduction) never leave the
chip.

Grid: one program per point tile, sequentially revisiting a single
accumulator block (TPU grid order makes += safe).
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
            img_ref, out_ref):
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

    xs = xs_ref[0, :]
    ys = ys_ref[0, :]
    z = z_ref[0, :]
    tmpl = tmpl_ref[0, :]
    valid = valid_ref[0, :] > 0.5  # f32 mask (bool refs are awkward in VMEM)

    # --- warp: back-project, rotate+translate, project (camera.rs:126-140,
    # lm_optimizer.rs:213-219) -------------------------------------------
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

    # --- bilinear sample via in-VMEM one-hot matmuls ----------------------
    height, width = img_ref.shape
    uf = jnp.floor(u)
    vf = jnp.floor(v)
    inside = (uf >= 0.0) & (uf < width - 2) & (vf >= 0.0) & (vf < height - 2) & valid
    u0 = jnp.clip(uf.astype(jnp.int32), 0, width - 2)
    v0 = jnp.clip(vf.astype(jnp.int32), 0, height - 2)
    a = u - uf
    b = v - vf

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, height), 1)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE, width), 1)
    rows = jnp.where(row_idx == v0[:, None], (1.0 - b)[:, None], 0.0) + jnp.where(
        row_idx == v0[:, None] + 1, b[:, None], 0.0
    )
    cols = jnp.where(col_idx == u0[:, None], (1.0 - a)[:, None], 0.0) + jnp.where(
        col_idx == u0[:, None] + 1, a[:, None], 0.0
    )
    interp_rows = jnp.dot(rows, img_ref[:], preferred_element_type=jnp.float32)
    vals = jnp.sum(interp_rows * cols, axis=1)

    maskf = inside.astype(jnp.float32)
    r = (vals - tmpl) * maskf

    # --- fused normal-equation reduction ----------------------------------
    jac = jac_ref[:]  # (TILE, 8): 6 jacobian cols + zero padding
    jm = jac * maskf[:, None]
    # rhs = [J | r | 0]: write r into padded column 6 with an iota select
    col8 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 8), 1)
    rhs = jnp.where(col8 == 6, r[:, None], jac)
    m = jnp.dot(jm.T, rhs, preferred_element_type=jnp.float32)  # (8, 8); rows 6,7 zero

    # accumulator layout: rows 0-5 cols 0-7 = [H | g | 0], row 6 col 0 = Σr²,
    # row 6 col 1 = Σ mask.  Widen (8,8) -> (8,128) with a one-hot selector
    # matmul (dynamic_update_slice is not lowerable on TPU Pallas).
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    ).astype(jnp.float32)
    acc = jnp.dot(m, sel, preferred_element_type=jnp.float32)  # (8, 128)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    acc = jnp.where((row_i == 6) & (col_i == 0), jnp.sum(r * r), acc)
    acc = jnp.where((row_i == 6) & (col_i == 1), jnp.sum(maskf), acc)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_residual_reduce(
    image_f32: jnp.ndarray,
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

    ``intr_params = [cx, cy, fx, fy, skew]``.  Candidate arrays are padded to
    a multiple of TILE by the caller (`valid` covers the padding).
    """
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

    def row_spec():
        return pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, _N_PARAMS), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row_spec(),
            row_spec(),
            row_spec(),
            row_spec(),
            row_spec(),
            pl.BlockSpec((TILE, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(image_f32.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interpret,
    )(
        params,
        xs.astype(Float).reshape(1, n),
        ys.astype(Float).reshape(1, n),
        idepth.astype(Float).reshape(1, n),
        tmpl_vals.astype(Float).reshape(1, n),
        valid.astype(Float).reshape(1, n),
        jac_padded,
        image_f32,
    )
    m = out[:6, :7]
    rsq = out[6, 0]
    count = out[6, 1]
    return m, rsq, count
