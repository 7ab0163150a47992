"""Exact coarse+fine eval renderer on the fused transposed Pallas field.

Same output contract as render.rendering.render_rays in test_time mode
(reference eval flow: models/rendering.py:199-260 with test_time=True), but
every point-level intermediate lives in the transposed (rows, N) layout the
fused kernel consumes: coordinates are built directly as (8, R, S) f32 and
flattened along lanes, and compositing reads σ/rgb as row slices of the
kernel's (8, N) output. Nothing narrow (minor dim < 128) ever round-trips
HBM — that data movement was ~35% of the v2 frame time.

Scope: deterministic eval only (test_time, perturb=0, noise_std=0), the
configuration BASELINE.md's throughput target is measured at. Training and
the general path keep render_rays (autodiff, perturb/noise, semantic heads).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.ops.pallas import fused_mlp
from nerf_siren_tpu.ops.pallas.fused_mlp import (
    IN_ROWS, SIGMA_ROW, fused_full_t, fused_sigma_t)
from nerf_siren_tpu.ops.sample_pdf import sample_pdf
from nerf_siren_tpu.render.rendering import composite, stratified_z_vals


def _coords_t(oT8: jax.Array, dT8: jax.Array, z_vals: jax.Array) -> jax.Array:
    """(8, R) origins/dirs + (R, S) depths -> flattened (8, R*S) coords."""
    r, s = z_vals.shape
    xyzT = oT8[:, :, None] + dT8[:, :, None] * z_vals[None, :, :]
    return xyzT.reshape(IN_ROWS, r * s)


def _kernels_for(packed_field: Dict[str, Any]):
    """(sigma, full) kernel pair by pack layout — an int8 pack
    (fused_mlp_int8.pack_nerf_params_int8) carries quantized-weight keys
    ('q0x'); callers opt into the MXU int8 trunk simply by packing with
    pack_model_params_int8 (measured full-kernel 1.29x bf16 on the v5e,
    132.7 vs 102.8 Mpts/s). Inference-only, not a parity surface."""
    if "q0x" in packed_field:
        from nerf_siren_tpu.ops.pallas.fused_mlp_int8 import (
            fused_full_t_int8, fused_sigma_t_int8)
        return fused_sigma_t_int8, fused_full_t_int8
    return fused_sigma_t, fused_full_t


def render_rays_fused(
    packed: Dict[str, Any],
    rays: jax.Array,
    cfg: RenderConfig = RenderConfig(),
    *,
    nerf_cfg: NeRFConfig = NeRFConfig(),
) -> Dict[str, jax.Array]:
    """Render (R, 8) rays with packed (pack_model_params) weights.

    Returns the test_time render_rays dict: opacity_coarse, rgb_fine,
    depth_fine, opacity_fine. R*S must keep the flattened point count a
    multiple of fused_mlp.TILE_N per pass (40_000-ray chunks with 64+64
    samples satisfy this); other sizes are lane-padded.
    """
    assert cfg.test_time and cfg.perturb == 0.0 and cfg.noise_std == 0.0, \
        "render_rays_fused is the deterministic eval path"
    assert cfg.n_importance > 0

    r = rays.shape[0]
    depth, skips = nerf_cfg.depth, nerf_cfg.skips
    # (8, R) transposed origins/directions (tiny relayout, R*3 floats)
    oT8 = jnp.pad(rays[:, 0:3].T, ((0, IN_ROWS - 3), (0, 0)))
    dT8 = jnp.pad(rays[:, 3:6].T, ((0, IN_ROWS - 3), (0, 0)))
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays[:, 3:6], axis=-1, keepdims=True)

    def pad_n(xT):
        # read TILE_N dynamically: tests shrink it for interpreter runs
        return jnp.pad(xT, ((0, 0), (0, -xT.shape[1] % fused_mlp.TILE_N)))

    sigma_coarse, _ = _kernels_for(packed["coarse"])
    _, full_fine = _kernels_for(packed["fine"])

    # ---- coarse σ-only pass -> importance weights -------------------------
    z_vals = stratified_z_vals(near, far, cfg.n_samples, use_disp=cfg.use_disp)
    xyzT = pad_n(_coords_t(oT8, dT8, z_vals))
    sig8 = sigma_coarse(packed["coarse"], xyzT, depth=depth, skips=skips)
    sigmas = sig8[SIGMA_ROW, : r * cfg.n_samples].reshape(r, cfg.n_samples)
    comp_c = composite(sigmas, z_vals, dir_norm)

    # ---- hierarchical resample (reference models/rendering.py:222-235) ----
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    z_fine = sample_pdf(z_mid, comp_c["weights"][:, 1:-1], cfg.n_importance,
                        rng=None, det=True)
    z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)
    s_all = cfg.n_samples + cfg.n_importance

    # ---- fine full pass, composited from row slices ------------------------
    xyzT = pad_n(_coords_t(oT8, dT8, z_all))
    dirT = pad_n(jnp.broadcast_to(dT8[:, :, None],
                                  (IN_ROWS, r, s_all)).reshape(IN_ROWS, r * s_all))
    out8 = full_fine(packed["fine"], xyzT, dirT, depth=depth, skips=skips)
    out8 = out8[:, : r * s_all]
    sig_f = out8[SIGMA_ROW].reshape(r, s_all)
    comp_f = composite(sig_f, z_all, dir_norm)
    w = comp_f["weights"]                                     # (R, S)
    rgbT = out8[:3].reshape(3, r, s_all)
    rgb = jnp.sum(w[None, :, :] * rgbT, axis=-1).T            # (R, 3)
    if cfg.white_back:
        rgb = rgb + (1.0 - comp_f["opacity"][:, None])

    return {
        "opacity_coarse": comp_c["opacity"],
        "rgb_fine": rgb,
        "depth_fine": jnp.sum(w * z_all, axis=-1),
        "opacity_fine": comp_f["opacity"],
    }
