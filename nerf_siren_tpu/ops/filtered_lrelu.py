"""filtered_lrelu — StyleGAN3's fused upsample → bias → leaky-relu → clamp →
downsample (reference: torch_utils/ops/filtered_lrelu.py:123-159 reference
path; the 1.8k-line CUDA implementation is never called by the repo,
SURVEY §2.4 — kept here as composable jnp for capability completeness).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from nerf_siren_tpu.ops.bias_act import bias_act
from nerf_siren_tpu.ops.upfirdn2d import upfirdn2d


def filtered_lrelu(x: jax.Array, fu: Optional[jax.Array] = None,
                   fd: Optional[jax.Array] = None, b: Optional[jax.Array] = None,
                   up: int = 1, down: int = 1, padding=0,
                   gain: float = math.sqrt(2), slope: float = 0.2,
                   clamp: Optional[float] = None) -> jax.Array:
    """y = downsample(fd, clamp(lrelu(upsample(fu, x + b)) * gain)).

    Matches the reference path semantics: bias first, zero-stuff upsample with
    `fu` (gain up²), leaky-relu with `gain`, optional ±clamp, FIR decimation
    with `fd`. Padding applies to the upsampled grid.
    """
    x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=padding, gain=up ** 2)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down)
    return x
