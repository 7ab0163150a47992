"""Image metrics: MSE, PSNR, SSIM (reference: metrics.py:4-20).

SSIM follows the kornia convention the reference uses: per-pixel structural
dissimilarity with a gaussian window, returned as 1 - 2*dssim ∈ [-1, 1].
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mse(image_pred: jax.Array, image_gt: jax.Array,
        valid_mask: Optional[jax.Array] = None, reduction: str = "mean") -> jax.Array:
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        if reduction == "mean":
            denom = jnp.maximum(jnp.sum(valid_mask), 1)
            return jnp.sum(jnp.where(valid_mask, value, 0.0)) / denom
        return jnp.where(valid_mask, value, 0.0)
    if reduction == "mean":
        return jnp.mean(value)
    return value


def psnr(image_pred: jax.Array, image_gt: jax.Array,
         valid_mask: Optional[jax.Array] = None, reduction: str = "mean") -> jax.Array:
    return -10.0 * jnp.log10(mse(image_pred, image_gt, valid_mask, reduction))


def _gaussian_kernel(window_size: int, sigma: float) -> jax.Array:
    x = jnp.arange(window_size, dtype=jnp.float32) - (window_size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _filter2d_sep(img: jax.Array, k1d: jax.Array) -> jax.Array:
    """Separable 'valid' gaussian filter over (N, C, H, W) via depthwise conv."""
    n, c, h, w = img.shape
    kh = k1d.reshape(1, 1, -1, 1)
    kw = k1d.reshape(1, 1, 1, -1)
    x = img.reshape(n * c, 1, h, w)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x.reshape(n, c, x.shape[-2], x.shape[-1])


def ssim(image_pred: jax.Array, image_gt: jax.Array,
         window_size: int = 3, max_val: float = 1.0, reduction: str = "mean") -> jax.Array:
    """SSIM on (N, C, H, W) images, kornia-style: returns 1 - 2*dssim ∈ [-1, 1]."""
    sigma = 1.5
    k = _gaussian_kernel(window_size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu1 = _filter2d_sep(image_pred, k)
    mu2 = _filter2d_sep(image_gt, k)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = _filter2d_sep(image_pred ** 2, k) - mu1_sq
    s2 = _filter2d_sep(image_gt ** 2, k) - mu2_sq
    s12 = _filter2d_sep(image_pred * image_gt, k) - mu12

    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    dssim = (1.0 - ssim_map) / 2.0
    if reduction == "mean":
        dssim = jnp.mean(dssim)
    return 1.0 - 2.0 * dssim
