"""The vanilla NeRF MLP, as a param pytree + pure apply function.

Architecture parity with the reference (reference: models/nerf.py:41-124):
8×256 xyz trunk with a skip concat of the xyz embedding at layer 4, a raw-sigma
head off the trunk, a 256-dim feature projection concatenated with the embedded
view direction into one 128-wide ReLU layer, and a sigmoid rgb head.

The semantic variant appends the NeRF_3D head (reference:
models/nerf_cls.py:56-61,103-104): Linear(W→2W) → Linear(2W→n_classes) →
sigmoid applied to the `xyz_encoding_final` feature, output layout
``[rgb(3), sigma(1), cls(n)]``.

TPU notes:
- apply operates on (..., C) batches; callers flatten (rays, samples) into one
  big batch so every layer is one MXU matmul.
- matmuls run at `compute_dtype` (bf16 for inference) with f32 accumulation.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.models.layers import init_linear, linear


def init_nerf(key: jax.Array, cfg: NeRFConfig = NeRFConfig(), dtype=jnp.float32) -> Dict[str, Any]:
    """Initialize NeRF MLP parameters."""
    n_keys = cfg.depth + 4 + (2 if cfg.n_classes > 0 else 0)
    keys = jax.random.split(key, n_keys)
    ki = iter(range(n_keys))

    xyz_layers = []
    for i in range(cfg.depth):
        if i == 0:
            in_dim = cfg.in_channels_xyz
        elif i in cfg.skips:
            in_dim = cfg.width + cfg.in_channels_xyz
        else:
            in_dim = cfg.width
        xyz_layers.append(init_linear(keys[next(ki)], in_dim, cfg.width, dtype))

    params = {
        "xyz_layers": xyz_layers,
        "xyz_final": init_linear(keys[next(ki)], cfg.width, cfg.width, dtype),
        "sigma": init_linear(keys[next(ki)], cfg.width, 1, dtype),
        "dir_layer": init_linear(keys[next(ki)], cfg.width + cfg.in_channels_dir, cfg.width // 2, dtype),
        "rgb": init_linear(keys[next(ki)], cfg.width // 2, 3, dtype),
    }
    if cfg.n_classes > 0:
        params["parse"] = [
            init_linear(keys[next(ki)], cfg.width, cfg.width * 2, dtype),
            init_linear(keys[next(ki)], cfg.width * 2, cfg.n_classes, dtype),
        ]
    return params


def apply_nerf(
    params: Dict[str, Any],
    xyz_emb: jax.Array,
    dir_emb: Optional[jax.Array] = None,
    *,
    cfg: NeRFConfig = NeRFConfig(),
    compute_dtype=None,
) -> jax.Array:
    """Run the MLP.

    Args:
      xyz_emb: (..., in_channels_xyz) embedded positions.
      dir_emb: (..., in_channels_dir) embedded directions, or None for the
        sigma-only fast path (reference: nerf.py:113-114).
    Returns:
      sigma (..., 1) if dir_emb is None, else [rgb, sigma] (..., 4)
      (+ cls logits (..., n_classes) appended when the semantic head exists
       and dir_emb is given → (..., 4 + n_classes)).
    """
    h = xyz_emb
    for i, layer in enumerate(params["xyz_layers"]):
        if i in cfg.skips:
            h = jnp.concatenate([xyz_emb, h], axis=-1)
        h = jax.nn.relu(linear(layer, h, compute_dtype))

    sigma = linear(params["sigma"], h, compute_dtype)
    if dir_emb is None:
        return sigma

    feat = linear(params["xyz_final"], h, compute_dtype)
    hd = jnp.concatenate([feat, dir_emb.astype(feat.dtype)], axis=-1)
    hd = jax.nn.relu(linear(params["dir_layer"], hd, compute_dtype))
    rgb = jax.nn.sigmoid(linear(params["rgb"], hd, compute_dtype))

    out = [rgb, sigma]
    if "parse" in params:
        c = linear(params["parse"][0], feat, compute_dtype)
        c = linear(params["parse"][1], c, compute_dtype)
        out.append(jax.nn.sigmoid(c))
    return jnp.concatenate(out, axis=-1)
