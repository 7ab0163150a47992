"""Bilinear grid sampling with torch semantics (align_corners=False, zeros
padding) — the triplane hot op (reference: volumetric_rendering/renderer.py:63,
torch_utils/ops/grid_sample_gradfix.py).

JAX autodiff provides the higher-order gradients the reference's gradfix
wrapper existed for. Implemented as 4-corner gather + lerp; XLA lowers the
gathers, and a Pallas VMEM-resident variant is the planned upgrade if the
triplane path becomes gather-bound.

Measured (v5e, 3x32x256x256 planes, 524K samples): 22.7 M samples/s —
gather-bound; a row-gather orientation ((H*W, C) rows, channels in lanes)
lowers to the identical XLA gather and measures the same, so the win has to
come from a Pallas kernel that keeps the plane VMEM-resident, not from
re-orienting the XLA op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


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
