"""Volume rendering core — the hot path.

Behavioral parity with the reference renderer (reference:
models/rendering.py:70-262): stratified sampling linear in depth or disparity,
optional perturbation, sigma noise, alpha compositing with the cumprod
transmittance recurrence, white background, the test-time sigma-only coarse
pass, and hierarchical importance sampling via `sample_pdf` on the interval
midpoints with the two edge weights dropped.

TPU-first differences from the reference:
- one pure function of (params, rays, rng); no Python chunk loop inside — the
  whole (N_rays, N_samples) slab is evaluated as a single batched MLP call so
  every layer is one MXU matmul. Memory is bounded by tiling *outside* jit
  (`render_rays_chunked` lax.map's over fixed-size ray tiles).
- explicit jax.random keys replace torch's global RNG.
- `jnp.sort` of the merged coarse+fine depths maps to XLA's sort (bitonic on
  TPU); `sample_pdf` uses a branch-free vectorized searchsorted.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.models.nerf import apply_nerf
from nerf_siren_tpu.ops.sample_pdf import sample_pdf


def composite(
    sigmas: jax.Array,
    z_vals: jax.Array,
    dir_norm: jax.Array,
    rgbs: Optional[jax.Array] = None,
    *,
    noise_std: float = 0.0,
    rng: Optional[jax.Array] = None,
    white_back: bool = False,
) -> Dict[str, jax.Array]:
    """Alpha-composite raw sigma (and rgb) along each ray.

    Implements the recurrence of reference models/rendering.py:162-190:
    alpha_i = 1 - exp(-delta_i * relu(sigma_i + noise)),
    w_i = alpha_i * prod_{j<i}(1 - alpha_j + 1e-10), with the final delta set
    to 1e10 and deltas scaled by the ray direction norm.

    Args:
      sigmas: (R, S) raw density.
      z_vals: (R, S) sample depths (sorted).
      dir_norm: (R, 1) |ray direction| (converts depth deltas to metric).
      rgbs: (R, S, 3) or None for the weights-only path.
    Returns:
      dict with 'weights' (R, S), 'opacity' (R,), and when rgbs is given
      'rgb' (R, 3) and 'depth' (R,).
    """
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    delta_inf = jnp.full_like(deltas[:, :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1) * dir_norm

    if noise_std > 0.0 and rng is not None:
        sigmas = sigmas + jax.random.normal(rng, sigmas.shape, sigmas.dtype) * noise_std

    alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sigmas))
    trans = jnp.cumprod(1.0 - alphas + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    weights = alphas * trans
    opacity = jnp.sum(weights, axis=-1)

    out = {"weights": weights, "opacity": opacity}
    if rgbs is not None:
        rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
        if white_back:
            rgb = rgb + (1.0 - opacity[..., None])
        out["rgb"] = rgb
        out["depth"] = jnp.sum(weights * z_vals, axis=-1)
    return out


def stratified_z_vals(
    near: jax.Array,
    far: jax.Array,
    n_samples: int,
    *,
    use_disp: bool = False,
    perturb: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Coarse depth samples, linear in depth or disparity, optionally jittered.

    near/far: (R, 1). Returns (R, n_samples).
    """
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not use_disp:
        z_vals = near * (1.0 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)

    if perturb > 0.0 and rng is not None:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([z_mid, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], z_mid], axis=-1)
        t = perturb * jax.random.uniform(rng, z_vals.shape, z_vals.dtype)
        z_vals = lower + (upper - lower) * t
    return z_vals


def _default_field_fn(params, xyz, dir_emb, *, nerf_cfg, n_freqs_xyz, compute_dtype):
    """Embed positions and run the NeRF MLP over a (R, S, 3) slab.

    TPU note: deliberately kept 3-D. Although XLA pads the 3/4-channel head
    outputs heavily on (R, S, C) tiles, flattening to (R*S, C) measures 25%
    SLOWER (310K→248K rays/s at 40K-ray chunks) — the reshape forces layout
    copies that cost more than the padded-head waste."""
    xyz_emb = positional_encoding(xyz, n_freqs_xyz)
    if dir_emb is None:
        return apply_nerf(params, xyz_emb, None, cfg=nerf_cfg, compute_dtype=compute_dtype)
    dir_b = jnp.broadcast_to(dir_emb[:, None, :], (*xyz.shape[:-1], dir_emb.shape[-1]))
    return apply_nerf(params, xyz_emb, dir_b, cfg=nerf_cfg, compute_dtype=compute_dtype)


def render_rays(
    params: Dict[str, Any],
    rays: jax.Array,
    cfg: RenderConfig = RenderConfig(),
    rng: Optional[jax.Array] = None,
    *,
    nerf_cfg: NeRFConfig = NeRFConfig(),
    n_freqs_xyz: int = 10,
    n_freqs_dir: int = 4,
    compute_dtype=None,
    field_fn: Optional[Callable] = None,
) -> Dict[str, jax.Array]:
    """Render a batch of rays.

    Args:
      params: {'coarse': nerf_params, 'fine': nerf_params (optional)}.
      rays: (R, 8) = [origin(3), direction(3), near, far]
        (reference: models/rendering.py:199-201).
      cfg: render configuration (static).
      rng: PRNG key for perturb/noise/importance-sampling; None → deterministic.
      field_fn: optional override of the radiance field evaluation,
        signature (model_params, xyz (R,S,3), dir_emb (R,Cd) | None) → raw
        outputs (R,S,1) sigma-only or (R,S,4+) rgb+sigma(+cls).

    Returns dict with keys rgb/depth/opacity_{coarse,fine} mirroring the
    reference output contract (models/rendering.py:236-260); test_time drops
    the coarse rgb pass and returns only opacity_coarse for the coarse model.
    """
    if field_fn is None:
        def field_fn(p, xyz, d_emb):
            return _default_field_fn(
                p, xyz, d_emb,
                nerf_cfg=nerf_cfg, n_freqs_xyz=n_freqs_xyz, compute_dtype=compute_dtype,
            )

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dir_emb = positional_encoding(rays_d, n_freqs_dir)

    if rng is not None:
        k_perturb, k_noise_c, k_pdf, k_noise_f = jax.random.split(rng, 4)
    else:
        k_perturb = k_noise_c = k_pdf = k_noise_f = None

    z_vals = stratified_z_vals(
        near, far, cfg.n_samples,
        use_disp=cfg.use_disp, perturb=cfg.perturb, rng=k_perturb,
    )
    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    result: Dict[str, jax.Array] = {}
    if cfg.test_time:
        sigmas = field_fn(params["coarse"], xyz_coarse, None)[..., 0]
        comp = composite(sigmas, z_vals, dir_norm,
                         noise_std=cfg.noise_std, rng=k_noise_c)
        result["opacity_coarse"] = comp["opacity"]
        weights_coarse = comp["weights"]
    else:
        raw = field_fn(params["coarse"], xyz_coarse, dir_emb)
        comp = composite(
            raw[..., 3], z_vals, dir_norm, raw[..., :3],
            noise_std=cfg.noise_std, rng=k_noise_c, white_back=cfg.white_back,
        )
        result["rgb_coarse"] = comp["rgb"]
        result["depth_coarse"] = comp["depth"]
        result["opacity_coarse"] = comp["opacity"]
        if raw.shape[-1] > 4:  # field-level semantic head (NeRF_3D layout
            # [rgb, sigma, cls...], reference models/nerf_cls.py:111)
            result["cls_coarse"] = jnp.sum(
                comp["weights"][..., None] * raw[..., 4:], axis=-2)
        weights_coarse = comp["weights"]

    if cfg.n_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(
            z_mid, weights_coarse[:, 1:-1], cfg.n_importance,
            rng=k_pdf, det=(cfg.perturb == 0.0),
        )
        z_fine = jax.lax.stop_gradient(z_fine)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)
        xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]

        raw = field_fn(params["fine"], xyz_fine, dir_emb)
        comp = composite(
            raw[..., 3], z_all, dir_norm, raw[..., :3],
            noise_std=cfg.noise_std, rng=k_noise_f, white_back=cfg.white_back,
        )
        result["rgb_fine"] = comp["rgb"]
        result["depth_fine"] = comp["depth"]
        result["opacity_fine"] = comp["opacity"]
        if raw.shape[-1] > 4:
            result["cls_fine"] = jnp.sum(
                comp["weights"][..., None] * raw[..., 4:], axis=-2)

    return result


def render_rays_chunked(
    params: Dict[str, Any],
    rays: jax.Array,
    cfg: RenderConfig = RenderConfig(),
    rng: Optional[jax.Array] = None,
    **kwargs,
) -> Dict[str, jax.Array]:
    """Render an arbitrary number of rays in fixed-size tiles.

    The TPU-native replacement for the reference's Python chunk loop
    (reference: system.py:205-216): rays are padded to a multiple of
    `cfg.chunk` and processed with `lax.map`, so the per-tile program has
    static shapes and is compiled once.
    """
    n = rays.shape[0]
    chunk = min(cfg.chunk, n) if n > 0 else cfg.chunk
    n_tiles = -(-n // chunk)
    pad = n_tiles * chunk - n
    rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
    tiles = rays_p.reshape(n_tiles, chunk, rays.shape[1])

    if rng is not None:
        keys = jax.random.split(rng, n_tiles)
    else:
        keys = None

    def body(args):
        tile, key = args
        return render_rays(params, tile, cfg, key, **kwargs)

    if keys is None:
        out = jax.lax.map(lambda t: render_rays(params, t, cfg, None, **kwargs), tiles)
    else:
        out = jax.lax.map(body, (tiles, keys))
    return {k: v.reshape(n_tiles * chunk, *v.shape[2:])[:n] for k, v in out.items()}
