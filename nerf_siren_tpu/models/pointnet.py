"""PointNet dense segmentation in JAX (reference: models/pointnets.py).

Architecture parity with the reference's PointNetDenseCls(k, inc=6):
- STN3d input-transform: 3 per-point linears (64/128/1024, BN bypassed as in
  the reference, pointnets.py:35-41) → global max-pool → FC 512/256/9 with a
  ReLU ON the last FC (pointnets.py:52 — a reference quirk, kept) → +identity.
- PointNetfeat(global_feat=False): STN on xyz only, rgb passthrough
  (pointnets.py:116-124), per-point 64/128/1024 with BN, masked global
  max-pool, global-feature broadcast concat → 1088-d point features.
- DenseCls head: 512/256/128/k with BN, per-point log_softmax.

TPU-first differences:
- Conv1d(kernel=1) over (1, C, P) becomes a plain (P, C) matmul.
- The point cloud has a FIXED capacity with a validity mask (the reference's
  variable-size gathered cloud is a dynamic shape, SURVEY §7): max-pools and
  BN statistics are masked.
- BatchNorm uses per-call masked batch statistics (the reference trains with
  batch=1 cloud, so train-mode BN ≡ per-cloud stats; we use the same at eval
  — divergence from torch eval-mode running stats, documented here).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_siren_tpu.models.layers import init_linear, linear


def _init_bn(dim: int) -> Dict[str, jax.Array]:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _masked_bn(params, x: jax.Array, mask: Optional[jax.Array], eps: float = 1e-5):
    """BatchNorm over the point axis with a validity mask. x: (P, C)."""
    if mask is None:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
    else:
        m = mask[:, None].astype(x.dtype)
        count = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=0) / count
        var = jnp.sum((x - mean) ** 2 * m, axis=0) / count
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * params["scale"] + params["bias"]


def _masked_max(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Max over points (axis 0) ignoring invalid rows. x: (P, C) → (C,)."""
    if mask is not None:
        x = jnp.where(mask[:, None], x, -jnp.inf)
    out = jnp.max(x, axis=0)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def init_stn3d(key: jax.Array) -> Dict[str, Any]:
    ks = jax.random.split(key, 6)
    return {
        "conv1": init_linear(ks[0], 3, 64),
        "conv2": init_linear(ks[1], 64, 128),
        "conv3": init_linear(ks[2], 128, 1024),
        "fc1": init_linear(ks[3], 1024, 512),
        "fc2": init_linear(ks[4], 512, 256),
        "fc3": init_linear(ks[5], 256, 9),
    }


def apply_stn3d(params, xyz: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """xyz: (P, 3) → (3, 3) transform."""
    h = jax.nn.relu(linear(params["conv1"], xyz))
    h = jax.nn.relu(linear(params["conv2"], h))
    h = jax.nn.relu(linear(params["conv3"], h))
    g = _masked_max(h, mask)
    g = jax.nn.relu(linear(params["fc1"], g))
    g = jax.nn.relu(linear(params["fc2"], g))
    g = jax.nn.relu(linear(params["fc3"], g))  # reference quirk: relu on fc3
    return g.reshape(3, 3) + jnp.eye(3)


def init_pointnet_feat(key: jax.Array, inc: int = 6) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    return {
        "stn": init_stn3d(ks[0]),
        "conv1": init_linear(ks[1], inc, 64),
        "conv2": init_linear(ks[2], 64, 128),
        "conv3": init_linear(ks[3], 128, 1024),
        "bn1": _init_bn(64),
        "bn2": _init_bn(128),
        "bn3": _init_bn(1024),
    }


def apply_pointnet_feat(params, pts: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """pts: (P, inc) with xyz in the first 3 channels → (P, 1088) features."""
    xyz, others = pts[:, :3], pts[:, 3:]
    trans = apply_stn3d(params["stn"], xyz, mask)
    xyz = xyz @ trans
    x = jnp.concatenate([xyz, others], axis=1)

    x = jax.nn.relu(_masked_bn(params["bn1"], linear(params["conv1"], x), mask))
    pointfeat = x                                        # (P, 64)
    x = jax.nn.relu(_masked_bn(params["bn2"], linear(params["conv2"], x), mask))
    x = _masked_bn(params["bn3"], linear(params["conv3"], x), mask)
    g = _masked_max(x, mask)                             # (1024,)
    g = jnp.broadcast_to(g[None, :], (pts.shape[0], 1024))
    return jnp.concatenate([g, pointfeat], axis=1)       # (P, 1088)


def init_pointnet_dense_cls(key: jax.Array, k: int = 2, inc: int = 6) -> Dict[str, Any]:
    ks = jax.random.split(key, 5)
    return {
        "feat": init_pointnet_feat(ks[0], inc),
        "conv1": init_linear(ks[1], 1088, 512),
        "conv2": init_linear(ks[2], 512, 256),
        "conv3": init_linear(ks[3], 256, 128),
        "conv4": init_linear(ks[4], 128, k),
        "bn1": _init_bn(512),
        "bn2": _init_bn(256),
        "bn3": _init_bn(128),
    }


def apply_pointnet_dense_cls(params, pts: jax.Array,
                             mask: Optional[jax.Array] = None) -> jax.Array:
    """Per-point k-class log-probabilities. pts: (P, inc) → (P, k)."""
    x = apply_pointnet_feat(params["feat"], pts, mask)
    x = jax.nn.relu(_masked_bn(params["bn1"], linear(params["conv1"], x), mask))
    x = jax.nn.relu(_masked_bn(params["bn2"], linear(params["conv2"], x), mask))
    x = jax.nn.relu(_masked_bn(params["bn3"], linear(params["conv3"], x), mask))
    x = linear(params["conv4"], x)
    return jax.nn.log_softmax(x, axis=-1)


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """||T Tᵀ - I|| regularizer (reference: pointnets.py:198-205)."""
    d = trans.shape[-1]
    diff = trans @ jnp.swapaxes(trans, -1, -2) - jnp.eye(d)
    return jnp.mean(jnp.linalg.norm(diff, axis=(-2, -1)))
