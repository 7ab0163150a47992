"""upfirdn2d — pad / upsample / FIR-filter / downsample in one logical pass.

Semantics match the reference's python reference implementation (reference:
torch_utils/ops/upfirdn2d.py:169-217 _upfirdn2d_ref, :279-391 helpers); the
953-line CUDA kernel is unnecessary on TPU: zero-stuffing maps to
`lhs_dilation`, decimation to window strides, and the depthwise FIR to a
feature-grouped `lax.conv_general_dilated` that XLA schedules on the MXU/VPU.

Layout: NCHW activations, filters are 1-D or 2-D f32 arrays prepared by
`setup_filter` (normalized; [1,3,3,1] → 4×4 outer product).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def setup_filter(f, normalize: bool = True, gain: float = 1.0) -> jnp.ndarray:
    """Prepare a FIR filter (reference upfirdn2d.py:21-61 setup_filter)."""
    if f is None:
        f = [1.0]
    f = jnp.asarray(f, jnp.float32)
    if f.ndim == 0:
        f = f[None]
    separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    f = f * (gain ** (f.ndim / 2))
    return f


def _parse_padding(padding) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    return tuple(padding)


def _parse_scaling(s) -> Tuple[int, int]:
    if isinstance(s, int):
        return s, s
    return tuple(s)


def upfirdn2d(x: jax.Array, f: Optional[jax.Array], up=1, down=1, padding=0,
              flip_filter: bool = False, gain: float = 1.0) -> jax.Array:
    """x: (N, C, H, W). Returns filtered/resampled (N, C, H', W')."""
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    n, c, in_h, in_w = x.shape

    # Upsample by zero insertion.
    if upx > 1 or upy > 1:
        x = x.reshape(n, c, in_h, 1, in_w, 1)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, upy - 1), (0, 0), (0, upx - 1)))
        x = x.reshape(n, c, in_h * upy, in_w * upx)

    # Pad or crop.
    x = jnp.pad(x, ((0, 0), (0, 0),
                    (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0))))
    x = x[:, :, max(-py0, 0): x.shape[2] - max(-py1, 0),
          max(-px0, 0): x.shape[3] - max(-px1, 0)]

    # Filter gain; FIR convolution flips the filter unless flip_filter.
    fk = f * (gain ** (f.ndim / 2))
    fk = fk.astype(x.dtype)
    if not flip_filter:
        fk = jnp.flip(fk, axis=tuple(range(fk.ndim)))

    def _depthwise(x, kern):
        kh, kw = kern.shape[-2], kern.shape[-1]
        w = jnp.broadcast_to(kern.reshape(1, 1, kh, kw), (c, 1, kh, kw))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    if fk.ndim == 2:
        x = _depthwise(x, fk)
    else:  # separable 1-D: vertical then horizontal
        x = _depthwise(x, fk.reshape(-1, 1))
        x = _depthwise(x, fk.reshape(1, -1))

    # Downsample by decimation.
    return x[:, :, ::downy, ::downx]


def _filter_size(f) -> Tuple[int, int]:
    if f is None:
        return 1, 1
    return f.shape[-1], f.shape[0]


def upsample2d(x, f, up=2, padding=0, gain: float = 1.0) -> jax.Array:
    """(reference upfirdn2d.py:312-340)."""
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [px0 + (fw + upx - 1) // 2,
         px1 + (fw - upx) // 2,
         py0 + (fh + upy - 1) // 2,
         py1 + (fh - upy) // 2]
    return upfirdn2d(x, f, up=up, padding=p, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, gain: float = 1.0) -> jax.Array:
    """(reference upfirdn2d.py:361-391)."""
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [px0 + (fw - downx + 1) // 2,
         px1 + (fw - downx) // 2,
         py0 + (fh - downy + 1) // 2,
         py1 + (fh - downy) // 2]
    return upfirdn2d(x, f, down=down, padding=p, gain=gain)


def filter2d(x, f, padding=0, gain: float = 1.0) -> jax.Array:
    """(reference upfirdn2d.py:279-310)."""
    px0, px1, py0, py1 = _parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, gain=gain)
