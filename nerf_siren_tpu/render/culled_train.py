"""Proxy-culled TRAINING renderer — spend model FLOPs only where the scene is.

The reference training step evaluates the full MLP at 64 uniform coarse +
(64+64) hierarchical fine samples per ray (reference:
models/rendering.py:140-190, 192 evaluations/ray), even though at
convergence almost all compositing weight sits in a handful of samples near
the first surface. The eval-side answer to that waste is the distilled-proxy
fast renderer (render/fast.py); this module is the TRAINING-side analogue:

1. a tiny proxy MLP (the same architecture render/fast.py distills into)
   is trained ONLINE, jointly with the field, by regressing
   log1p(relu(sigma_fine)) at every point the step already evaluated —
   the targets are free, no extra field evaluations;
2. each step scores C uniform candidates per ray with the proxy (pure MXU
   matmuls, ~250x cheaper than the field) and inverse-CDF samples `n_sel`
   depths from the proxy's expected-weight distribution — exactly the
   reference's hierarchical sample_pdf with the proxy standing in for the
   coarse network's placement role;
3. `n_uni` stratified-uniform samples are merged in as an exploration
   floor: early in training (random proxy) they make the step behave like
   a plain (n_sel+n_uni)-sample uniform trainer, and at convergence they
   keep dis-occluded/empty regions from going stale (the field is never
   supervised only where the proxy already believes the surface is);
4. coarse and fine both evaluate ONLY the K = n_sel + n_uni merged depths
   (the coarse network keeps training — its checkpoint role and the exact
   renderer's test-time sigma pass need it — but no longer pays 64
   placement-only evaluations).

Cost per ray: 2K field evaluations + C proxy scores, vs the reference
recipe's 64 + (64+64). At the frontier recipe (64+64) and the default
K=24 this is a 4x field-FLOP reduction; convergence parity is measured
on-chip by tools/fused_train_parity.py --backends jnp culled (see
docs/fused_train_parity.json).

Selection is detached (stop_gradient, like the reference's sample_pdf
z-values), so no gradient flows from the photometric loss into the proxy;
the proxy trains purely from its regression term. Phantom suppression
(asymmetric over-prediction penalty, render/fast.py::distill_proxy) is kept:
phantom density absorbs the expected-weight transmittance before the true
surface, which mis-places the selected samples.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.ops.sample_pdf import sample_pdf
from nerf_siren_tpu.render.fast import apply_proxy
from nerf_siren_tpu.render.rendering import (_default_field_fn, composite,
                                             stratified_z_vals)


def render_rays_culled(
    params: Dict[str, Any],
    rays: jax.Array,
    cfg: RenderConfig,
    rng: jax.Array,
    *,
    nerf_cfg: NeRFConfig = NeRFConfig(),
    n_candidates: int = 32,
    n_sel: int = 16,
    n_uni: int = 8,
    overpredict_weight: float = 16.0,
    n_freqs_xyz: int = 10,
    n_freqs_dir: int = 4,
    compute_dtype=None,
    field_fn: Optional[Callable] = None,
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """One culled training forward. rays (R, 8) → (render dict, proxy loss).

    params must hold 'coarse', 'fine' AND 'proxy' (init_proxy pytree).
    Returns the standard rgb/depth/opacity_{coarse,fine} dict (the loss
    registry consumes it unchanged) plus the proxy regression loss to add
    to the training objective. Requires an rng (this is a training path).
    """
    assert "fine" in params and "proxy" in params, \
        "culled training needs a fine model and a proxy in params"
    proxy = params["proxy"]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dir_emb = positional_encoding(rays_d, n_freqs_dir)
    k_pdf, k_uni, k_noise_c, k_noise_f = jax.random.split(rng, 4)

    if field_fn is None:
        def field_fn(p, xyz, d_emb):
            return _default_field_fn(
                p, xyz, d_emb, nerf_cfg=nerf_cfg, n_freqs_xyz=n_freqs_xyz,
                compute_dtype=compute_dtype)

    # -- proxy-guided placement (detached) ---------------------------------
    t = jnp.linspace(0.0, 1.0, n_candidates)
    z_cand = near * (1.0 - t) + far * t                        # (R, C)
    spacing = (far - near) / (n_candidates - 1)
    xyz_cand = rays_o[:, None, :] + rays_d[:, None, :] * z_cand[..., None]
    score = apply_proxy(proxy, jax.lax.stop_gradient(xyz_cand),
                        jnp.bfloat16)
    sigma_hat = jnp.expm1(jax.nn.relu(score.astype(jnp.float32)))
    a_hat = 1.0 - jnp.exp(-sigma_hat * spacing * dir_norm)
    tr = jnp.cumprod(1.0 - a_hat + 1e-10, axis=-1)
    tr = jnp.concatenate([jnp.ones_like(tr[:, :1]), tr[:, :-1]], axis=-1)
    w_hat = a_hat * tr                                         # (R, C)
    z_mid = 0.5 * (z_cand[:, :-1] + z_cand[:, 1:])
    z_sel = sample_pdf(z_mid, w_hat[:, 1:-1], n_sel, rng=k_pdf,
                       det=(cfg.perturb == 0.0))
    z_uni = stratified_z_vals(near, far, n_uni, use_disp=cfg.use_disp,
                              perturb=cfg.perturb, rng=k_uni)
    z_all = jnp.sort(jnp.concatenate([z_uni, z_sel], axis=-1), axis=-1)
    z_all = jax.lax.stop_gradient(z_all)                       # (R, K)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]

    # -- field evaluations at the K survivors ------------------------------
    result: Dict[str, jax.Array] = {}
    raw_c = field_fn(params["coarse"], xyz, dir_emb)
    comp = composite(raw_c[..., 3], z_all, dir_norm, raw_c[..., :3],
                     noise_std=cfg.noise_std, rng=k_noise_c,
                     white_back=cfg.white_back)
    result["rgb_coarse"] = comp["rgb"]
    result["depth_coarse"] = comp["depth"]
    result["opacity_coarse"] = comp["opacity"]

    raw_f = field_fn(params["fine"], xyz, dir_emb)
    comp = composite(raw_f[..., 3], z_all, dir_norm, raw_f[..., :3],
                     noise_std=cfg.noise_std, rng=k_noise_f,
                     white_back=cfg.white_back)
    result["rgb_fine"] = comp["rgb"]
    result["depth_fine"] = comp["depth"]
    result["opacity_fine"] = comp["opacity"]

    # -- online proxy regression (free targets) ----------------------------
    # The K points mix proxy-selected (surface) and uniform (mostly empty)
    # locations — the same occupied/empty coverage distill_proxy engineers
    # with its importance half. f32 end to end: the regression is tiny and
    # drives sample placement, bf16 rounding here costs selection quality.
    target = jnp.log1p(jax.nn.relu(
        jax.lax.stop_gradient(raw_f[..., 3].astype(jnp.float32))))
    pred = apply_proxy(proxy, jax.lax.stop_gradient(xyz), None)
    err = pred - target
    w_reg = (1.0 + target) * jnp.where(err > 0, overpredict_weight, 1.0)
    proxy_loss = jnp.mean(w_reg * err ** 2)
    return result, proxy_loss
