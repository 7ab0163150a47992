"""Bilinear grid sampling with torch semantics (align_corners=False, zeros
padding) — the triplane hot op (reference: volumetric_rendering/renderer.py:63,
torch_utils/ops/grid_sample_gradfix.py).

JAX autodiff provides the higher-order gradients the reference's gradfix
wrapper existed for. Implemented as 4-corner gather + lerp; XLA lowers the
gathers, and a Pallas VMEM-resident variant is the planned upgrade if the
triplane path becomes gather-bound.

Measured (v5e, 3x32x256x256 planes, 786K samples/pass): the 4-corner
element gather runs ~32 M samples/s in f32 regardless of formulation —
channel-first, (H*W, C) row gathers with slice (1, C), and a (2, 2, C)
block gather all measure within 4%. The one formulation that wins is the
BLOCK gather on a bf16 channel-last table: one (2, 2, C) slice fetches
all four bilinear corners per point, and at 256 B/block the gather rate
rises to 52 M samples/s (1.64x). bf16 on the element-gather formulation
is SLOWER (25.5 M/s) — the win needs fewer, larger gather elements, not
fewer bytes. grid_sample_2d_packed + pack_grid_for_block_sample expose
that path; a Mosaic kernel is not an option (tpu.dynamic_gather only
shuffles within vreg lanes/sublanes — no large-table gather primitive).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def grid_sample_2d(features: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (B, C, H, W) features at (B, M, 2) normalized coords (x, y in
    [-1, 1], x indexes width). Returns (B, M, C).

    Matches torch F.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False).
    """
    b, c, h, w = features.shape
    x = coords[..., 0]
    y = coords[..., 1]
    ix = ((x + 1) * w - 1) / 2
    iy = ((y + 1) * h - 1) / 2

    ix0 = jnp.floor(ix).astype(jnp.int32)
    iy0 = jnp.floor(iy).astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1
    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        mask = ((ix_ >= 0) & (ix_ < w) & (iy_ >= 0) & (iy_ < h))
        ixc = jnp.clip(ix_, 0, w - 1)
        iyc = jnp.clip(iy_, 0, h - 1)
        flat = iyc * w + ixc                                    # (B, M)
        feats = features.reshape(b, c, h * w)
        out = jnp.take_along_axis(feats, flat[:, None, :], axis=2)  # (B, C, M)
        return jnp.where(mask[:, None, :], out, 0.0)

    out = (gather(iy0, ix0) * (wy0 * wx0)[:, None, :]
           + gather(iy0, ix1) * (wy0 * wx1)[:, None, :]
           + gather(iy1, ix0) * (wy1 * wx0)[:, None, :]
           + gather(iy1, ix1) * (wy1 * wx1)[:, None, :])
    return jnp.swapaxes(out, 1, 2)                               # (B, M, C)


def pack_grid_for_block_sample(features: jax.Array,
                               dtype=jnp.bfloat16) -> jax.Array:
    """(B, C, H, W) → (B, H+2, W+2, C) zero-bordered channel-last table.

    One-time-per-frame layout for grid_sample_2d_packed. The 1-texel zero
    border makes CLIP-mode (2, 2, C) block gathers exact for every corner
    index in [-1, size-1]: the shifted start stays in [0, size] and a
    corner that falls on the border reads the zero the zeros-padding
    semantics require."""
    t = jnp.transpose(features, (0, 2, 3, 1)).astype(dtype)
    return jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))


def grid_sample_2d_packed(table: jax.Array, coords: jax.Array) -> jax.Array:
    """grid_sample_2d on a pack_grid_for_block_sample table.

    table (B, H+2, W+2, C), coords (B, M, 2) normalized as in
    grid_sample_2d → (B, M, C) f32. Exact same math as grid_sample_2d up
    to the table dtype (bitwise-equal for an f32 table; tested). Measured
    1.64x on v5e with a bf16 table (52 vs 32 M samples/s): the four
    bilinear corners arrive as ONE (2, 2, C) gather block instead of four
    strided element gathers."""
    b, hp, wp, c = table.shape
    h, w = hp - 2, wp - 2
    x = coords[..., 0]
    y = coords[..., 1]
    ix = ((x + 1) * w - 1) / 2
    iy = ((y + 1) * h - 1) / 2
    ix0 = jnp.floor(ix).astype(jnp.int32)
    iy0 = jnp.floor(iy).astype(jnp.int32)
    wx1 = (ix - ix0)[..., None]
    wy1 = (iy - iy0)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    starts = jnp.stack([iy0 + 1, ix0 + 1], axis=-1)          # (B, M, 2)

    def one(tbl, st):
        return lax.gather(tbl, st, dn, slice_sizes=(2, 2, c),
                          mode=lax.GatherScatterMode.CLIP)
    blk = jax.vmap(one)(table, starts).astype(jnp.float32)   # (B, M, 2, 2, C)

    out = (blk[:, :, 0, 0] * (wy0 * wx0) + blk[:, :, 0, 1] * (wy0 * wx1)
           + blk[:, :, 1, 0] * (wy1 * wx0) + blk[:, :, 1, 1] * (wy1 * wx1))
    # beyond one texel outside the grid CLIP would distort the block; the
    # true zeros-padding answer there is 0 for every corner
    valid = ((ix0 >= -1) & (ix0 <= w - 1) & (iy0 >= -1) & (iy0 <= h - 1))
    return out * valid[..., None]


def grid_sample_3d(grid: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample (B, C, D, H, W) at (B, M, 3) normalized (x, y, z) coords;
    x indexes W, y indexes H, z indexes D (torch convention). → (B, M, C)."""
    b, c, d, h, w = grid.shape
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    ix = ((x + 1) * w - 1) / 2
    iy = ((y + 1) * h - 1) / 2
    iz = ((z + 1) * d - 1) / 2

    ix0, iy0, iz0 = (jnp.floor(v).astype(jnp.int32) for v in (ix, iy, iz))
    fx, fy, fz = ix - ix0, iy - iy0, iz - iz0

    flat_grid = grid.reshape(b, c, d * h * w)

    def gather(iz_, iy_, ix_):
        mask = ((ix_ >= 0) & (ix_ < w) & (iy_ >= 0) & (iy_ < h)
                & (iz_ >= 0) & (iz_ < d))
        ixc = jnp.clip(ix_, 0, w - 1)
        iyc = jnp.clip(iy_, 0, h - 1)
        izc = jnp.clip(iz_, 0, d - 1)
        flat = (izc * h + iyc) * w + ixc
        out = jnp.take_along_axis(flat_grid, flat[:, None, :], axis=2)
        return jnp.where(mask[:, None, :], out, 0.0)

    out = 0.0
    for dz, wz in ((iz0, 1 - fz), (iz0 + 1, fz)):
        for dy, wy in ((iy0, 1 - fy), (iy0 + 1, fy)):
            for dx, wx in ((ix0, 1 - fx), (ix0 + 1, fx)):
                out = out + gather(dz, dy, dx) * (wz * wy * wx)[:, None, :]
    return jnp.swapaxes(out, 1, 2)
