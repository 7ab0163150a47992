"""2D convolution with optional up/downsampling (reference:
torch_utils/ops/conv2d_resample.py:48-147).

Implements the reference's documented generic semantics — pad once, zero-stuff
upsample + FIR, convolve, FIR + decimate — on `lax.conv_general_dilated`.
`flip_weight=True` is correlation (torch F.conv2d), False flips the kernel.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nerf_siren_tpu.ops.upfirdn2d import _parse_padding, upfirdn2d


def conv2d(x: jax.Array, w: jax.Array, padding=0, stride: int = 1,
           groups: int = 1, flip_weight: bool = True) -> jax.Array:
    """Plain torch-style conv2d. w: (O, I//groups, kh, kw)."""
    if not flip_weight and w.shape[-1] > 1:
        w = jnp.flip(w, axis=(-2, -1))
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        py, px = padding
        pad = ((py, py), (px, px))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv2d_resample(x: jax.Array, w: jax.Array, f: Optional[jax.Array] = None,
                    up: int = 1, down: int = 1, padding=0, groups: int = 1,
                    flip_weight: bool = True, flip_filter: bool = False) -> jax.Array:
    out_channels, in_per_group, kh, kw = w.shape
    fw = f.shape[-1] if f is not None else 1
    fh = f.shape[0] if f is not None else 1
    px0, px1, py0, py1 = _parse_padding(padding)

    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if down > 1 and up == 1:
        # filter + pad, then strided conv (reference fast path 3)
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # generic: upsample(+filter) with the adjusted padding, then convolve
    x = upfirdn2d(x, f if up > 1 else None, up=up,
                  padding=[px0, px1, py0, py1], gain=up ** 2, flip_filter=flip_filter)
    x = conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
