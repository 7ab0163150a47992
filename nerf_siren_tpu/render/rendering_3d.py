"""Semantic volume rendering — render_rays_3d (reference:
models/rendering.py:265-472).

Same ray march as render_rays, then per ray-sample semantics:
1. threshold the compositing weights (0.5 at test time, 0 in training,
   reference rendering.py:354-357),
2. gather the surviving (xyz, rgb) samples into one point cloud, normalize
   xyz by the Frobenius norm of the whole cloud treated as a constant
   (reference rendering.py:364-365 detaches through numpy),
3. run PointNet dense segmentation on the 6-channel cloud,
4. scatter per-point log-probabilities back to (R, S, C) (zeros elsewhere),
5. composite cls_final = Σ_s w_s · cls_s.

TPU-first redesign (SURVEY §7 "dynamic-shape hazard"): the reference's
boolean-mask gather has data-dependent size. Here the cloud has a FIXED
capacity: the top-K samples by weight are selected (K static), each with a
validity flag (weight > threshold); PointNet max-pools and BN statistics are
masked accordingly. With K ≥ #above-threshold points the result is exactly
the reference computation.

The NeRF field can be evaluated under stop_gradient (no_grad_on_nerf,
reference rendering.py:306-310) so only PointNet trains.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.models.pointnet import apply_pointnet_dense_cls
from nerf_siren_tpu.ops.sample_pdf import sample_pdf
from nerf_siren_tpu.render.rendering import (
    _default_field_fn,
    composite,
    stratified_z_vals,
)


def semantic_from_weights(
    points_params: Dict[str, Any],
    xyz: jax.Array,        # (R, S, 3)
    rgbs: jax.Array,       # (R, S, 3)
    weights: jax.Array,    # (R, S)
    *,
    n_classes: int,
    threshold: float,
    point_capacity: int,
    points_apply: Callable = apply_pointnet_dense_cls,
    point_norm: str = "frob",
) -> jax.Array:
    """Steps 1-5 above → composited (R, n_classes) log-prob field.

    point_norm: 'frob' (default) divides xyz by the Frobenius norm of the
    whole valid cloud — the reference's quirk (rendering.py:364-365),
    which makes the coordinate SCALE depend on the valid-point COUNT, so
    a training batch's cloud (a few thousand rays) and an eval frame's
    cloud (a full image) feed PointNet differently-scaled coordinates.
    'rms' divides by the per-point RMS (frob/sqrt(count)) — count-
    invariant; measured against 'frob' by tools/semantic_convergence.py.
    """
    r, s, _ = xyz.shape
    n = r * s
    k = min(point_capacity, n)

    w_flat = weights.reshape(n)
    # top-k via full argsort: lax.top_k with k in the thousands is very slow
    # on TPU (measured ~0.9 s/step at k=8192); a bitonic full sort of the
    # same array is milliseconds
    order = jnp.argsort(-w_flat)
    idx = jax.lax.slice_in_dim(order, 0, k)
    sel_w = w_flat[idx]
    valid = sel_w > threshold

    xyz_sel = xyz.reshape(n, 3)[idx]
    rgb_sel = rgbs.reshape(n, 3)[idx]

    # Frobenius norm of the valid cloud, as a constant (reference detaches)
    sq = jnp.sum(xyz_sel ** 2, axis=-1) * valid
    norm = jax.lax.stop_gradient(jnp.sqrt(jnp.maximum(jnp.sum(sq), 1e-12)))
    if point_norm == "rms":
        count = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        norm = norm / jax.lax.stop_gradient(jnp.sqrt(count))
    pts = jnp.concatenate([xyz_sel / norm, rgb_sel], axis=-1)  # (K, 6)

    preds = points_apply(points_params, pts, valid)            # (K, C) log-probs
    preds = jnp.where(valid[:, None], preds, 0.0)

    cls_flat = jnp.zeros((n, n_classes), preds.dtype).at[idx].set(preds)
    cls = cls_flat.reshape(r, s, n_classes)
    return jnp.sum(weights[..., None] * cls, axis=-2)          # (R, C)


def render_rays_3d(
    params: Dict[str, Any],
    rays: jax.Array,
    cfg: RenderConfig = RenderConfig(),
    rng: Optional[jax.Array] = None,
    *,
    nerf_cfg: NeRFConfig = NeRFConfig(),
    n_classes: int = 6,
    point_capacity: int = 8192,
    no_grad_on_nerf: bool = True,
    n_freqs_xyz: int = 10,
    n_freqs_dir: int = 4,
    compute_dtype=None,
    points_apply: Callable = apply_pointnet_dense_cls,
    cls_threshold: Optional[float] = None,
    point_norm: str = "frob",
) -> Dict[str, jax.Array]:
    """Render rgb + depth + per-ray class log-prob maps.

    params: {'coarse': nerf, 'fine': nerf (optional), 'points': pointnet}.
    Output keys add cls_coarse/cls_fine to the render_rays contract
    (reference rendering.py:445-470).

    cls_threshold overrides the reference's weight-mask threshold
    (rendering.py:354-361: weights > 0.5 at test time, > 0 in training).
    The 0.5 test-time mask presumes the reference recipe (64 coarse + 128
    importance samples on a converged field) where single samples at a
    sharp surface absorb most of the transmittance; on a diffuse or
    weakly-converged field no weight reaches 0.5, the valid set goes
    empty, and class maps silently degenerate to class 0 (the
    tests/test_semantic.py threshold-override test demonstrates exactly
    this on a random-init field). eval.py exposes this as
    --cls_threshold for test-time (N_importance > 0) evaluation.
    """
    def field_fn(p, xyz, d_emb):
        out = _default_field_fn(p, xyz, d_emb, nerf_cfg=nerf_cfg,
                                n_freqs_xyz=n_freqs_xyz, compute_dtype=compute_dtype)
        return jax.lax.stop_gradient(out) if no_grad_on_nerf else out

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dir_emb = positional_encoding(rays_d, n_freqs_dir)
    threshold = ((0.5 if cfg.test_time else 0.0)
                 if cls_threshold is None else cls_threshold)

    if rng is not None:
        k_perturb, k_noise_c, k_pdf, k_noise_f = jax.random.split(rng, 4)
    else:
        k_perturb = k_noise_c = k_pdf = k_noise_f = None

    z_vals = stratified_z_vals(near, far, cfg.n_samples,
                               use_disp=cfg.use_disp, perturb=cfg.perturb, rng=k_perturb)
    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    result: Dict[str, jax.Array] = {}
    if cfg.test_time:
        sigmas = field_fn(params["coarse"], xyz_coarse, None)[..., 0]
        comp = composite(sigmas, z_vals, dir_norm, noise_std=cfg.noise_std, rng=k_noise_c)
        result["opacity_coarse"] = comp["opacity"]
        weights_coarse = comp["weights"]
    else:
        raw = field_fn(params["coarse"], xyz_coarse, dir_emb)
        comp = composite(raw[..., 3], z_vals, dir_norm, raw[..., :3],
                         noise_std=cfg.noise_std, rng=k_noise_c, white_back=cfg.white_back)
        result["rgb_coarse"] = comp["rgb"]
        result["depth_coarse"] = comp["depth"]
        result["opacity_coarse"] = comp["opacity"]
        result["cls_coarse"] = semantic_from_weights(
            params["points"], xyz_coarse, raw[..., :3], comp["weights"],
            n_classes=n_classes, threshold=threshold,
            point_capacity=point_capacity, points_apply=points_apply,
            point_norm=point_norm)
        weights_coarse = comp["weights"]

    if cfg.n_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(z_mid, weights_coarse[:, 1:-1], cfg.n_importance,
                            rng=k_pdf, det=(cfg.perturb == 0.0))
        z_all = jnp.sort(jnp.concatenate([z_vals, jax.lax.stop_gradient(z_fine)], -1), -1)
        xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]

        raw = field_fn(params["fine"], xyz_fine, dir_emb)
        comp = composite(raw[..., 3], z_all, dir_norm, raw[..., :3],
                         noise_std=cfg.noise_std, rng=k_noise_f, white_back=cfg.white_back)
        result["rgb_fine"] = comp["rgb"]
        result["depth_fine"] = comp["depth"]
        result["opacity_fine"] = comp["opacity"]
        result["cls_fine"] = semantic_from_weights(
            params["points"], xyz_fine, raw[..., :3], comp["weights"],
            n_classes=n_classes, threshold=threshold,
            point_capacity=point_capacity, points_apply=points_apply,
            point_norm=point_norm)

    return result
