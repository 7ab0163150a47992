"""Pallas triplane gather-lerp kernel — the EG3D sampling hot loop.

SURVEY §2.4 marks triplane bilinear sampling as THE perf-critical op of the
EG3D stack (reference hot loop: volumetric_rendering/renderer.py:55-65); the
jnp path tops out at the gather op's per-element issue rate (52 M samples/s
with bf16 block gathers, access-order-invariant — ops/grid_sample.py), which
makes the exact EG3D render ~90% pure gather.

Mosaic has no vectorized gather primitive, so this kernel removes gathers
entirely by exploiting the ray structure: EG3D's plane projections are
orthographic (axis-aligned world drops, renderer.py:39-53), so a ray's
samples trace a STRAIGHT, uniformly-spaced line on each plane, and a group
of (ray-block x depth-slab) points has a small, analytically-boundable
plane footprint. Per group:

1. the group's plane tile (TILE_H rows x TILE_PX texels, all C channels)
   is DMA'd HBM->VMEM at a scalar-prefetched origin (pl.ds dynamic slice
   — the one data-dependent primitive Mosaic does have);
2. the y-lerp becomes ONE MXU matmul: a (TILE_H, T) one-hot-pair matrix
   with the bilinear y-weights folded in, contracted against the tile
   (TILE_H, TILE_PX*C) — points live in LANES, so the matmul is dense;
3. the x-lerp is a TILE_PX-step unrolled VPU reduction: for each texel
   column j, acc += tile_rows[j*C:(j+1)*C, :] * X[j, :], with X the
   weight-folded x one-hot pair. Fully lane-parallel, C*TILE_PX FMAs/pt.

Points whose group footprint exceeds the tile (grazing geometry, extreme
FOV) come back with valid=0 and are re-sampled by the caller through the
jnp block-gather path at GROUP granularity (fixed-capacity miss list —
the same pattern as render/fast.py's edge refinement). Zero-padding
border semantics match ops/grid_sample.grid_sample_2d_packed exactly
(1-texel zero border baked into the table; beyond-border points zeroed).

Arithmetic (v5e): TILE_PX=32, TILE_H=128, T=512 -> 131K MXU MACs + 1K VPU
FMAs per point; 25.2M plane-samples/frame ~ 6.6 TFLOP ~ 50 ms at the
chip's practical matmul peak vs 485 ms at the measured gather ceiling.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tunables (shrunk by tests for interpreter runs)
TILE_H = 128        # plane rows per tile (MXU contraction dim)
TILE_PX = 32        # plane texels per tile row
GROUP_T = 512       # points per group (lane dim of the one-hot matmuls)


def pack_plane_rowmajor(plane: jax.Array, dtype=jnp.bfloat16,
                        tile_px: int = None) -> jax.Array:
    """(C, H, W) plane -> (H+2+rowpad, (W+2+xpad)*C) channel-minor table.

    1-texel zero border on every side (zero-padding border semantics, as
    pack_grid_for_block_sample); x additionally padded so the lane count
    is a multiple of 128 AND the widest tile fits at the rightmost valid
    origin; rows padded so the tallest tile fits. Indices into the table
    are the plane indices + 1.
    """
    tile_px = tile_px or TILE_PX
    c, h, w = plane.shape
    wp = w + 2
    # lane alignment: tile x-origins step in units of 128 lanes = 128//c
    # texels; pad W so any origin in [0, wp - tile_px] works
    xq = max(128 // c, 1)
    wp_pad = -(wp % xq) % xq + max(0, tile_px - wp)
    hp_pad = max(0, TILE_H - (h + 2))
    t = jnp.pad(plane.astype(dtype), ((0, 0), (1, 1 + hp_pad), (1, 1 + wp_pad)))
    # (C, Hp, Wp) -> (Hp, Wp, C) -> (Hp, Wp*C): channel-minor rows
    return t.transpose(1, 2, 0).reshape(h + 2 + hp_pad, -1)


def _gather_kernel(ty_ref, tx_ref, pts_ref, table_ref, feats_ref, valid_ref,
                   tile, sem, *, tile_h, tile_px, c):
    """One group: DMA tile, one-hot y-matmul, unrolled x-lerp."""
    g = pl.program_id(0)
    # origins arrive in QUANTIZED units (rows/8, lanes/128) and are scaled
    # here so Mosaic can PROVE the memref slice offsets divisible by the
    # (8, 128) tiling — raw i32 offsets fail its divisibility analysis
    ty = ty_ref[g] * 8
    txl = tx_ref[g] * 128              # x origin in LANES (texel*c)
    dma = pltpu.make_async_copy(
        table_ref.at[pl.ds(ty, tile_h), pl.ds(txl, tile_px * c)],
        tile, sem)
    dma.start()

    pts = pts_ref[...]                 # (8, T) f32: iy0 ix0 wy1 wx1 oob ...
    iy0 = pts[0].astype(jnp.int32)     # plane indices (unshifted)
    ix0 = pts[1].astype(jnp.int32)
    wy1 = pts[2]
    wx1 = pts[3]
    oob = pts[4]                       # 1.0 where beyond-border (output 0)
    t_pts = pts.shape[-1]

    # local indices inside the tile (+1 border shift)
    iyl = iy0 + 1 - ty
    ixl = ix0 + 1 - txl // c
    fits = ((iyl >= 0) & (iyl <= tile_h - 2)
            & (ixl >= 0) & (ixl <= tile_px - 2))
    iyl = jnp.where(fits, iyl, 0)
    ixl = jnp.where(fits, ixl, 0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, t_pts), 0)
    a_y = (jnp.where(rows == iyl[None, :], 1.0 - wy1[None, :], 0.0)
           + jnp.where(rows == iyl[None, :] + 1, wy1[None, :], 0.0))

    dma.wait()
    # (TILE_H, L) x (TILE_H, T) -> (L, T): y-lerped rows, points in lanes
    r_t = jax.lax.dot_general(
        tile[...], a_y.astype(tile.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_px, t_pts), 0)
    x_w = (jnp.where(cols == ixl[None, :], 1.0 - wx1[None, :], 0.0)
           + jnp.where(cols == ixl[None, :] + 1, wx1[None, :], 0.0))

    acc = jnp.zeros((c, t_pts), jnp.float32)
    for j in range(tile_px):
        acc = acc + r_t[j * c:(j + 1) * c, :] * x_w[j:j + 1, :]

    ok = fits & (oob < 0.5)
    feats_ref[...] = acc * ok[None, :].astype(jnp.float32)
    # row 0: kernel result usable (fits); oob points are usable zeros
    valid_ref[...] = jnp.broadcast_to(
        (fits | (oob > 0.5))[None, :].astype(jnp.float32), valid_ref.shape)


def triplane_gather_plane(
    table: jax.Array,
    iy0: jax.Array, ix0: jax.Array,
    wy1: jax.Array, wx1: jax.Array,
    oob: jax.Array,
    ty: jax.Array, txl: jax.Array,
    *,
    c: int,
    tile_h: int = None, tile_px: int = None,
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array]:
    """Gather-lerp one plane for grouped points.

    table: pack_plane_rowmajor output (Hp, Wp*C).
    iy0/ix0/wy1/wx1/oob: (G, T) per-point bilinear data (plane indices).
    ty/txl: (G,) int32 tile origins in QUANTIZED units — rows/8 and
    lanes/128 (the kernel rescales; keeps Mosaic's divisibility proof).
    Returns feats (G, C, T) f32 and valid (G, T) bool — valid=False points
    must be resampled by the caller (group footprint exceeded the tile).
    """
    tile_h = tile_h or TILE_H
    tile_px = tile_px or TILE_PX
    g, t_pts = iy0.shape
    pts = jnp.stack([iy0.astype(jnp.float32), ix0.astype(jnp.float32),
                     wy1.astype(jnp.float32), wx1.astype(jnp.float32),
                     oob.astype(jnp.float32),
                     jnp.zeros_like(wy1), jnp.zeros_like(wy1),
                     jnp.zeros_like(wy1)], axis=1)        # (G, 8, T)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((None, 8, t_pts), lambda i, ty, tx: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),         # full table (HBM ok)
        ],
        out_specs=[
            pl.BlockSpec((None, c, t_pts), lambda i, ty, tx: (i, 0, 0)),
            pl.BlockSpec((None, 8, t_pts), lambda i, ty, tx: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_h, tile_px * c), table.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    feats, valid = pl.pallas_call(
        functools.partial(_gather_kernel, tile_h=tile_h, tile_px=tile_px,
                          c=c),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((g, c, t_pts), jnp.float32),
                   jax.ShapeDtypeStruct((g, 8, t_pts), jnp.float32)],
        interpret=interpret,
    )(ty, txl, pts, table)
    return feats, valid[:, 0, :] > 0.5
