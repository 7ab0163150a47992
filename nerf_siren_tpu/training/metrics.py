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


def confusion_matrix(pred_cls: jax.Array, gt_cls: jax.Array, n_classes: int,
                     ignore_index: Optional[int] = None) -> jax.Array:
    """(n_classes, n_classes) counts[gt, pred] over flat int predictions."""
    pred_cls = pred_cls.reshape(-1)
    gt_cls = gt_cls.reshape(-1)
    valid = jnp.ones_like(gt_cls, dtype=bool)
    if ignore_index is not None:
        valid = gt_cls != ignore_index
    idx = jnp.where(valid, gt_cls * n_classes + pred_cls, 0)
    counts = jnp.zeros(n_classes * n_classes, jnp.int32).at[idx].add(
        valid.astype(jnp.int32))
    return counts.reshape(n_classes, n_classes)


def miou(pred_cls: jax.Array, gt_cls: jax.Array, n_classes: int,
         ignore_index: Optional[int] = None):
    """Mean intersection-over-union + per-class IoU (the semantic-NeRF
    evaluation metric; the reference reports only pixel accuracy).

    Returns (miou_scalar, per_class_iou (n_classes,)); classes absent from
    both prediction and ground truth get IoU nan and are excluded from the
    mean."""
    cm = confusion_matrix(pred_cls, gt_cls, n_classes, ignore_index)
    inter = jnp.diag(cm).astype(jnp.float32)
    union = (cm.sum(0) + cm.sum(1)).astype(jnp.float32) - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1), jnp.nan)
    return jnp.nanmean(iou), iou


def class_accuracy(pred_cls: jax.Array, gt_cls: jax.Array, n_classes: int,
                   ignore_index: Optional[int] = None):
    """(overall pixel accuracy, per-class recall (n_classes,))."""
    cm = confusion_matrix(pred_cls, gt_cls, n_classes, ignore_index)
    total = jnp.maximum(cm.sum(), 1).astype(jnp.float32)
    overall = jnp.diag(cm).sum().astype(jnp.float32) / total
    per_class = jnp.where(cm.sum(1) > 0,
                          jnp.diag(cm) / jnp.maximum(cm.sum(1), 1),
                          jnp.nan)
    return overall, per_class
