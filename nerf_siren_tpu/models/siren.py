"""SIREN / FiLM sinusoidal-activation NeRF (reference: models/nerf.py:126-215).

The framework's namesake. Architecture parity with the reference's
`SemanticNeRF` (a pi-GAN TALLSIREN descendant):
- `FiLMLayer`: sin(freq ⊙ (Wx + b) + phase) (reference nerf.py:142-151),
- `UniformBoxWarp(51)`: coordinates scaled by 2/51 (reference nerf.py:134-140),
- 8 FiLM trunk layers (3→256, 256→256 ×7), sigma head off the trunk,
- color branch: FiLM on [ray_dir, trunk] then linear+sigmoid
  (reference nerf.py:201-215),
- frequencies = raw*15 + 30 (reference nerf.py:202),
- SIREN init: trunk U(±√(6/fan_in)/25) (`frequency_init(25)`), first layer
  U(±1/fan_in) (reference nerf.py:126-132, 153-157).

The reference ships this module DEAD — its mapping network is commented out
and `np` is unimported (reference nerf.py:185, 198; SURVEY §2.1). Here it is
wired properly: a pi-GAN-style `CustomMappingNetwork` (z → 3-layer LeakyReLU
MLP → per-layer frequencies/phases) plus a learnable per-scene latent z, so
the SIREN field trains end-to-end like any other field in render_rays.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_siren_tpu.models.layers import init_linear_uniform

BOX_WARP_SIDELENGTH = 51.0


def _init_film(key, in_dim, out_dim, freq=25.0, first=False):
    if first:
        bound = 1.0 / in_dim
    else:
        bound = math.sqrt(6.0 / in_dim) / freq
    return init_linear_uniform(key, in_dim, out_dim, bound)


def _init_mapping_linear(key, in_dim, out_dim):
    # pi-GAN uses kaiming-normal-ish linear inits for the mapping net;
    # torch default suffices for capability parity
    from nerf_siren_tpu.models.layers import init_linear
    return init_linear(key, in_dim, out_dim)


def init_siren_nerf(key: jax.Array, hidden_dim: int = 256, n_layers: int = 8,
                    z_dim: int = 100, learnable_z: bool = True,
                    n_classes: int = 0) -> Dict[str, Any]:
    """n_classes > 0 appends the nerf_cls-style semantic head
    (Linear(h→2h) → Linear(2h→C) → sigmoid off the trunk, reference
    models/nerf_cls.py:56-61 applied to the SIREN trunk) — the
    'SIREN-activation NeRF + semantic nerf_cls head' capability."""
    n_freq_outputs = (n_layers + 1) * hidden_dim * 2
    keys = jax.random.split(key, n_layers + 9)
    net = [_init_film(keys[0], 3, hidden_dim, first=True)]
    for i in range(1, n_layers):
        net.append(_init_film(keys[i], hidden_dim, hidden_dim))
    params = {
        "network": net,
        "final_layer": _init_film(keys[n_layers], hidden_dim, 1),
        "color_layer_sine": _init_film(keys[n_layers + 1], hidden_dim + 3, hidden_dim),
        "color_layer_linear": _init_film(keys[n_layers + 2], hidden_dim, 3),
        "mapping": [
            _init_mapping_linear(keys[n_layers + 3], z_dim, 256),
            _init_mapping_linear(keys[n_layers + 4], 256, 256),
            _init_mapping_linear(keys[n_layers + 5], 256, n_freq_outputs),
        ],
    }
    if learnable_z:
        params["z"] = jax.random.normal(keys[n_layers + 6], (1, z_dim))
    if n_classes > 0:
        from nerf_siren_tpu.models.layers import init_linear
        params["parse"] = [
            init_linear(keys[n_layers + 7], hidden_dim, 2 * hidden_dim),
            init_linear(keys[n_layers + 8], 2 * hidden_dim, n_classes),
        ]
    return params


def apply_film(layer: Dict[str, jax.Array], x: jax.Array,
               freq: jax.Array, phase: jax.Array) -> jax.Array:
    h = x @ layer["kernel"] + layer["bias"]
    return jnp.sin(freq * h + phase)


def apply_mapping(params, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """z (1, z_dim) → (frequencies, phase_shifts), each (1, (n+1)*hidden)."""
    h = z
    for i, layer in enumerate(params["mapping"]):
        h = h @ layer["kernel"] + layer["bias"]
        if i < len(params["mapping"]) - 1:
            h = jax.nn.leaky_relu(h, 0.2)
    freqs, phases = jnp.split(h, 2, axis=-1)
    return freqs, phases


def apply_siren_nerf(
    params: Dict[str, Any],
    xyz: jax.Array,              # (..., 3)
    ray_dirs: jax.Array,         # (..., 3)
    z: Optional[jax.Array] = None,
    frequencies: Optional[jax.Array] = None,
    phase_shifts: Optional[jax.Array] = None,
    hidden_dim: int = 256,
    box_sidelength: float = BOX_WARP_SIDELENGTH,
) -> jax.Array:
    """FiLM-conditioned field: returns [rgb(3), sigma(1)] (reference
    nerf.py:197-215 forward / forward_with_frequencies_phase_shifts).

    box_sidelength: UniformBoxWarp size — coordinates scale by
    2/box_sidelength so a scene box of that sidelength maps to [-1, 1].
    The reference hardcodes 51 (Replica-room scale, nerf.py:134-140);
    for other scenes pass ~the scene AABB's extent, or the sin-activation
    trunk sees near-zero inputs and barely trains (measured: the ±2.2
    spheres scene stalls at ~10 dB with 51, converges with 4.4)."""
    if frequencies is None:
        if z is None:
            z = params["z"]
        frequencies, phase_shifts = apply_mapping(params, z)
    frequencies = frequencies * 15.0 + 30.0

    x = xyz * (2.0 / box_sidelength)
    for i, layer in enumerate(params["network"]):
        s, e = i * hidden_dim, (i + 1) * hidden_dim
        x = apply_film(layer, x, frequencies[..., s:e], phase_shifts[..., s:e])

    sigma = x @ params["final_layer"]["kernel"] + params["final_layer"]["bias"]
    rgb = apply_film(
        params["color_layer_sine"],
        jnp.concatenate([ray_dirs, x], axis=-1),
        frequencies[..., -hidden_dim:], phase_shifts[..., -hidden_dim:])
    rgb = jax.nn.sigmoid(
        rgb @ params["color_layer_linear"]["kernel"] + params["color_layer_linear"]["bias"])
    out = [rgb, sigma]
    if "parse" in params:
        c = x @ params["parse"][0]["kernel"] + params["parse"][0]["bias"]
        c = c @ params["parse"][1]["kernel"] + params["parse"][1]["bias"]
        out.append(jax.nn.sigmoid(c))
    return jnp.concatenate(out, axis=-1)


def siren_field_fn(params, xyz, dir_emb, hidden_dim: int = 256,
                   box_sidelength: float = BOX_WARP_SIDELENGTH):
    """render_rays field_fn: the SIREN color branch consumes RAW directions,
    recovered from the embedding's passthrough channels (dir_emb[..., :3]).
    The sigma branch is direction-independent, so the sigma-only path feeds
    zero dirs."""
    r, s, _ = xyz.shape
    if dir_emb is None:
        dirs = jnp.zeros((r, s, 3), xyz.dtype)
        out = apply_siren_nerf(params, xyz, dirs, hidden_dim=hidden_dim,
                               box_sidelength=box_sidelength)
        return out[..., 3:4]
    dirs = jnp.broadcast_to(dir_emb[:, None, :3], (r, s, 3))
    return apply_siren_nerf(params, xyz, dirs, hidden_dim=hidden_dim,
                            box_sidelength=box_sidelength)


def make_siren_field_fn(rays_d: jax.Array, hidden_dim: int = 256,
                        box_sidelength: float = BOX_WARP_SIDELENGTH):
    """Compatibility wrapper around siren_field_fn (rays_d is unused — raw
    dirs come from the embedding passthrough)."""
    import functools
    return functools.partial(siren_field_fn, hidden_dim=hidden_dim,
                             box_sidelength=box_sidelength)
