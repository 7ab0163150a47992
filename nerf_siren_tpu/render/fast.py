"""Accelerated eval rendering via proxy-guided sample culling.

The parity renderer spends ~98% of its FLOPs on NeRF MLP evaluations, most of
them in empty space. Occupancy-grid culling (NerfAcc-style) is the standard
fix, but on TPU the per-sample grid GATHER costs as much as the sigma MLP it
replaces (~24 ms per 2.6M lookups, measured). TPU-native alternative: distill
the density field into a TINY proxy MLP (~250x fewer FLOPs than the NeRF MLP)
and let IT score all candidate samples — pure MXU matmuls, no gathers — then
evaluate the full model only at each ray's top-K scoring samples.

Pipeline (render_rays_fast):
1. optionally tighten each ray's [near, far] to the scene AABB (analytic),
2. march S_c uniform candidates per ray (static shapes),
3. proxy sigma on all candidates (cheap) → EXPECTED COMPOSITING WEIGHT per
   candidate (alpha × transmittance under the proxy density),
4. per-ray top-K by expected weight, depths sorted ascending,
5. full NeRF MLP at the K survivors, alpha-composite with NeRF's nonuniform
   consecutive-difference quadrature.

The proxy trains by distillation from the converged field in seconds
(distill_proxy); quality is validated against the exact renderer in tests and
was tuned on a CONVERGED (27 dB) scene: weight ranking beats raw-σ ranking by
~8 dB there (σ's argmax sits inside solids, not at the visible surface), and
sub-interval refinement measurably hurts. This is an eval-path accelerator —
training uses the parity renderer.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.models.layers import init_linear, linear
from nerf_siren_tpu.models.nerf import apply_nerf
from nerf_siren_tpu.render.rendering import composite

PROXY_FREQS = 5  # 3 * (2*5 + 1) = 33 input channels


def init_proxy(key: jax.Array, hidden: int = 48) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    in_ch = 3 * (2 * PROXY_FREQS + 1)
    return {"l1": init_linear(k1, in_ch, hidden),
            "l2": init_linear(k2, hidden, 1)}


def apply_proxy(proxy: Dict[str, Any], xyz: jax.Array,
                compute_dtype=jnp.bfloat16) -> jax.Array:
    """Proxy density score for (..., 3) points → (...,)."""
    emb = positional_encoding(xyz, PROXY_FREQS)
    h = jax.nn.relu(linear(proxy["l1"], emb, compute_dtype))
    return linear(proxy["l2"], h, compute_dtype)[..., 0]


def apply_proxy_t(proxy: Dict[str, Any], xyzT: jax.Array,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """Proxy density score in the transposed lane-major layout.

    xyzT: (rows>=3, N) f32 with coordinates in rows 0-2 → scores (N,).
    Same math as apply_proxy; every intermediate keeps N in the minor
    (lane) dimension, so nothing narrow round-trips HBM — the point-major
    variant's (R,S,3)/(R,S,33) tiles waste 30/32 lanes on TPU."""
    x = xyzT[:3]
    k = jnp.exp2(jnp.arange(PROXY_FREQS, dtype=jnp.float32))
    scaled = (k[:, None, None] * x[None]).reshape(3 * PROXY_FREQS, -1)
    # reference interleave [x, sin(f0 x), cos(f0 x), sin(f1 x), ...] is a ROW
    # ORDER here; rebuild it so the l1 kernel applies unpermuted
    parts = [x]
    for i in range(PROXY_FREQS):
        parts.append(jnp.sin(scaled[3 * i: 3 * i + 3]))
        parts.append(jnp.cos(scaled[3 * i: 3 * i + 3]))
    emb = jnp.concatenate(parts, axis=0)                       # (33, N)
    dt = compute_dtype or jnp.float32
    w1 = proxy["l1"]["kernel"].astype(dt).T                    # (H, 33)
    h = jax.nn.relu(w1 @ emb.astype(dt)
                    + proxy["l1"]["bias"].astype(dt)[:, None])
    w2 = proxy["l2"]["kernel"].astype(dt).T                    # (1, H)
    score = w2 @ h + proxy["l2"]["bias"].astype(dt)[:, None]
    return score[0]


def distill_proxy(
    sigma_fn: Callable[[jax.Array], jax.Array],
    aabb_min, aabb_max,
    rng: jax.Array,
    steps: int = 1000,
    batch: int = 32768,
    lr: float = 5e-3,
    hidden: int = 96,
    overpredict_weight: float = 16.0,
) -> Dict[str, Any]:
    """Fit the proxy to log1p(relu(sigma)) of the field over the AABB.

    sigma_fn: (N, 3) → (N,) raw sigma of the converged model.

    Occupied regions are a tiny fraction of the AABB, so uniform sampling
    alone underfits the surface: each step re-samples half its batch as
    jittered copies of the currently-densest points (self-importance
    sampling), and the regression is weighted toward occupied targets.

    overpredict_weight > 1 penalizes OVER-prediction extra. For culling,
    phantom density in empty space is the lethal failure mode: the
    expected-weight ranking's transmittance gets absorbed by phantoms
    before the true surface, so top-k keeps miss it entirely (measured:
    foreground rays rendering at zero opacity on a sharp 33 dB field).
    Sweep on that field (agreement of the 32-candidate/keep-8 render with
    the exact render): weight 1 -> 15.1 dB, 4 -> 26.8, 16 -> 28.3, with
    phantom p99 scores dropping 3.6 -> 1.25; surface recall is preserved
    because occupied targets keep their (1 + target) weight.
    """
    aabb_min = jnp.asarray(aabb_min, jnp.float32)
    aabb_max = jnp.asarray(aabb_max, jnp.float32)
    extent = aabb_max - aabb_min
    proxy = init_proxy(rng, hidden)
    tx = optax.adam(lr)
    opt_state = tx.init(proxy)

    @jax.jit
    def step(proxy, opt_state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        uniform = aabb_min + jax.random.uniform(k1, (batch, 3)) * extent
        t_uniform = jnp.log1p(jax.nn.relu(sigma_fn(uniform)))

        # importance half: jitter the densest uniform points (argsort+slice:
        # lax.top_k with k in the tens of thousands is pathologically slow
        # on TPU)
        dense_idx = jax.lax.slice_in_dim(jnp.argsort(-t_uniform), 0, batch // 2)
        seeds = uniform[dense_idx]
        jitter = jax.random.normal(k2, seeds.shape) * (0.05 * extent)
        focus = jnp.clip(seeds + jitter, aabb_min, aabb_max)
        t_focus = jnp.log1p(jax.nn.relu(sigma_fn(focus)))

        pts = jnp.concatenate([uniform, focus])
        target = jnp.concatenate([t_uniform, t_focus])
        weight = 1.0 + target          # occupied targets count more

        def loss_fn(p):
            pred = apply_proxy(p, pts, compute_dtype=None)
            err = pred - target
            if overpredict_weight != 1.0:
                w_dir = jnp.where(err > 0, overpredict_weight, 1.0)
                return jnp.mean(weight * w_dir * err ** 2)
            return jnp.mean(weight * err ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(proxy)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(proxy, updates), opt_state, loss

    keys = jax.random.split(jax.random.fold_in(rng, 1), steps)
    for k in keys:
        proxy, opt_state, loss = step(proxy, opt_state, k)
    return proxy


def _field_kernel_for(packed_model: Dict[str, Any]):
    """Pick the fused field kernel by pack layout: an int8 pack
    (ops/pallas/fused_mlp_int8.pack_nerf_params_int8, trunk on the MXU's
    int8 path — 2.4x the bf16 chain in-kernel) carries quantized-weight
    keys; the bf16 pack (fused_mlp.pack_nerf_params) does not. Callers
    opt into int8 simply by packing with pack_model_params_int8."""
    if "q0x" in packed_model:
        from nerf_siren_tpu.ops.pallas.fused_mlp_int8 import fused_full_t_int8
        return fused_full_t_int8
    from nerf_siren_tpu.ops.pallas.fused_mlp import fused_full_t
    return fused_full_t


def render_rays_fast(
    params: Dict[str, Any],
    proxy: Dict[str, Any],
    rays: jax.Array,
    *,
    n_candidates: int = 192,
    n_keep: int = 32,
    nerf_cfg: NeRFConfig = NeRFConfig(),
    model: str = "fine",
    white_back: bool = False,
    compute_dtype=jnp.bfloat16,
    n_freqs_xyz: int = 10,
    n_freqs_dir: int = 4,
    scene_aabb=None,
    refine_mult: int = 1,
    select: str = "topk",
    packed_params: Optional[Dict[str, Any]] = None,
    packed_proxy: Optional[Dict[str, Any]] = None,
    adaptive: Optional[Tuple[float, int]] = None,
    cull: Optional[float] = None,
    placement: str = "mid",
    quadrature: str = "delta",
    return_samples: bool = False,
) -> Dict[str, jax.Array]:
    """Proxy-culled single-pass render. rays (R, 8) → dict rgb/depth/opacity.

    scene_aabb: optional ((3,), (3,)) min/max of the occupied region —
    analytically tightens each ray's [near, far] to the AABB intersection
    (pure arithmetic, no gathers), concentrating all candidates where the
    scene lives. Rays missing the box keep their original bounds (they
    composite to background anyway).

    select: how the n_keep full-model samples are placed.
      'topk' — keep the n_keep candidates with the highest expected
        compositing weight (discrete; round-1 behavior).
      'pdf'  — inverse-CDF sample the proxy's weight distribution
        (deterministic quantiles), exactly the reference's hierarchical
        sample_pdf (models/rendering.py:22-67) with the proxy standing in
        for the coarse network. With the phantom-suppressed proxy
        (overpredict_weight=16), pdf matches or beats topk at every
        measured (C, K): 29.8 vs 28.4 dB agreement at 32/8, 32.2 vs 28.4
        at 32/16 (frontier table in BASELINE.md); with a phantom-prone
        proxy it is strictly worse (quantiles chase the phantoms).

    packed_params: optional pack_model_params(params) — when given, the
      full-model evaluation at the survivors runs through the transposed
      fused Pallas kernel (ops/pallas/fused_mlp.py) instead of the jnp MLP,
      which roughly halves the dominant cost of this renderer.

    packed_proxy: optional pack_proxy_params(proxy) — with select='pdf' and
      packed_params both given, the ENTIRE pre-model pipeline (candidate
      march, proxy scoring, expected weights, inverse-CDF selection,
      survivor-coordinate layout) runs inside one Pallas kernel
      (ops/pallas/proxy_march.py) and the compositing stays lane-major;
      same semantics, ~none of the jnp path's narrow-layout HBM traffic.
      Requires even n_keep (lane-count alignment with the field kernel).

    adaptive: optional (hi_fraction, k_hi) — per-ray adaptive K on the
      fused pdf path. Every ray renders at n_keep first; the hi_fraction
      most ambiguous rays (largest opacity-gated spread of their selected
      depths — i.e. rays whose proxy CDF is dispersed AND that composite
      something) are re-rendered at k_hi and scattered back. Average model
      evals/ray = n_keep + hi_fraction*k_hi, so (8, 0.25, 32) costs K=16
      while giving the ambiguous tail K=32. MEASURED NEGATIVE on the
      frontier scene (docs/fast_frontier.json): at equal average cost it
      loses to uniformly raising n_keep (8+0.25x32 = 30.3 dB vs plain
      K=16 = 32.05 dB) — the K-limited residual is diffuse quadrature
      error across all foreground rays, not a rankable tail. Kept for
      experimentation.

    cull: optional ACTIVE FRACTION in (0, 1] — empty-ray culling on the
      fused pdf path, the inverse of `adaptive`: a cheap proxy-opacity
      prepass (ops/pallas/proxy_march.py::proxy_opacity — C proxy evals
      per ray, no selection or coordinate work) ranks all rays; only the
      `cull` highest-opacity rays run the march+field pipeline at n_keep,
      everything else composites to background (exactly what the exact
      renderer produces for empty rays on a converged field). Average
      model evals/ray = cull * n_keep. The fraction must cover the
      frame's true foreground; rays ranked below the budget render as
      background even if occupied, so size it with headroom (the
      frontier tool measures the quality cost on a 40-50%-foreground
      frame). NOTE: a fixed fraction is inherently per-pose — the
      multi-pose frontier (docs/fast_frontier.json) shows cull=0.65
      collapsing to 14 dB on sparser poses of the same scene; prefer
      make_auto_cull_renderer, which sizes the budget per frame.

    placement: 'mid' (default) places pdf samples at strata-centered
      quantiles u=(k+.5)/K — no sample burnt at CDF 0/1, measured +0.2 dB
      agreement at equal speed (docs/fast_frontier_cluster.json);
      'edges' reproduces the reference sample_pdf's deterministic
      endpoint placement u=k/(K-1) (the parity op ops/sample_pdf.py
      keeps 'edges' as ITS default — this fast mode is not a parity
      surface).

    quadrature: how each kept sample's alpha integrates the density.
      'delta' — NeRF's consecutive-difference deltas over the kept depths
        (round-1/2 behavior).
      'ratio' — proxy-shaped stratum quadrature (requires select='pdf',
        placement='mid'): the K mid-placed samples are equal-mass strata
        of the proxy's weight CDF, so each stratum's PROXY optical depth
        has the closed form tau_k = ln((1-c_k)/(1-c_{k+1})), c_k = kW/K
        with W the proxy's interior mass; scale it by the field/implied-
        proxy density ratio at the sample. Exact at ANY K when the field
        equals the placement CDF's implied density (the consecutive-delta
        rule is not), so the K-limited residual becomes the ratio's
        within-stratum variation only. Prototype: halves worst-case
        compositing error on two-surface rays at C=32/K=16.

    return_samples: additionally return the per-ray survivor samples —
      z_samples (R, K), w_samples (R, K) compositing weights, rgb_samples
      (R, K, 3) — so downstream heads can ride the same survivors the rgb
      composite used (eval.py --mode d3 --renderer fast composites the
      semantic head over these via rendering_3d.semantic_from_weights,
      mirroring the reference's weight-masked point cloud at
      models/rendering.py:354-379). Unsupported with cull/adaptive."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    r = rays.shape[0]

    def proxy_scores(z):
        """Proxy score at every candidate depth, (R, S).

        Deliberately point-major: XLA fully fuses the tiny proxy MLP into
        the candidate-coordinate computation, so nothing narrow hits HBM.
        A transposed lane-major variant (apply_proxy_t) measured SLOWER
        (6.2 vs 5.1 ms per 1.28M pts on-chip: the hand-built (33,N)
        embedding materializes where the fused form never does) and its
        bf16 matmul orientation shifts scores by ~2.5% of their std —
        enough to perturb top-k selection."""
        xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        return apply_proxy(proxy, xyz, compute_dtype)

    if scene_aabb is not None:
        lo = jnp.asarray(scene_aabb[0], jnp.float32)
        hi = jnp.asarray(scene_aabb[1], jnp.float32)
        invd = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
        t_lo = (lo - rays_o) * invd
        t_hi = (hi - rays_o) * invd
        t_min = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1, keepdims=True)
        t_max = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1, keepdims=True)
        hits = t_max > jnp.maximum(t_min, 0.0)
        near = jnp.where(hits, jnp.clip(t_min, near, far), near)
        far = jnp.where(hits, jnp.clip(t_max, near, far), far)

    def weight_top_k(z, dz, k):
        """Keep the k candidate depths with the highest EXPECTED COMPOSITING
        WEIGHT under the proxy density — not the highest raw density: the
        top-σ samples sit inside solids while rendering needs the visible
        leading edge (ranking by σ loses ~8 dB at convergence, measured).
        The proxy predicts log1p(σ), so σ̂ = expm1(score); weights follow the
        standard transmittance recurrence over the candidate march. Selection
        uses a one-hot contraction (minor-axis take_along_axis lowers to slow
        TPU gathers)."""
        s = z.shape[-1]
        score = proxy_scores(z)                                   # (R, S)
        sigma_hat = jnp.expm1(jax.nn.relu(score.astype(jnp.float32)))
        a_hat = 1.0 - jnp.exp(-sigma_hat * dz * dir_norm)
        tr = jnp.cumprod(1.0 - a_hat + 1e-10, axis=-1)
        tr = jnp.concatenate([jnp.ones_like(tr[:, :1]), tr[:, :-1]], axis=-1)
        _, idx = jax.lax.top_k(a_hat * tr, k)
        idx = jnp.sort(idx, axis=-1)
        onehot = (idx[..., None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2))
        return jnp.einsum("rks,rs->rk", onehot.astype(z.dtype), z)

    def proxy_weights(z, dz):
        """Expected compositing weight of every candidate under the proxy."""
        score = proxy_scores(z)                                   # (R, S)
        sigma_hat = jnp.expm1(jax.nn.relu(score.astype(jnp.float32)))
        a_hat = 1.0 - jnp.exp(-sigma_hat * dz * dir_norm)
        tr = jnp.cumprod(1.0 - a_hat + 1e-10, axis=-1)
        tr = jnp.concatenate([jnp.ones_like(tr[:, :1]), tr[:, :-1]], axis=-1)
        return a_hat * tr

    if select == "pdf" and packed_proxy is not None and packed_params is not None:
        if quadrature == "ratio":
            assert placement == "mid", \
                "quadrature='ratio' needs equal-mass strata (placement='mid')"
        from nerf_siren_tpu.ops.pallas import proxy_march
        from nerf_siren_tpu.ops.pallas.fused_mlp import (
            TILE_N, SIGMA_ROW)

        fused_full_t = _field_kernel_for(packed_params[model])
        tile = proxy_march.TILE_R

        def fused_pdf(raysT, k):
            """March+select+eval+composite padded lane-major rays at K=k.

            Returns point-major (Rp,·) rgb/depth/opacity plus the selected
            depths zs (k, Rp) — the caller uses zs spread for adaptive-K
            ambiguity ranking."""
            rp = raysT.shape[1]
            ratio_quad = quadrature == "ratio"
            sel = proxy_march.proxy_march_select(
                packed_proxy, raysT, n_candidates, k,
                midpoint=placement == "mid", return_density=ratio_quad)
            zs, xyzT, dirT = sel[:3]
            out8 = fused_full_t(packed_params[model], xyzT, dirT,
                                depth=nerf_cfg.depth, skips=nerf_cfg.skips)
            # kernel point order: ray-tile major, then candidate, then ray
            nt = rp // tile
            out8 = out8.reshape(8, nt, k, tile)
            sig_kr = out8[SIGMA_ROW].transpose(1, 0, 2).reshape(k, rp)
            rgb_kr = out8[:3].transpose(0, 2, 1, 3).reshape(3, k, rp)
            near_t, far_t = raysT[6:7], raysT[7:8]
            dirn_t = jnp.sqrt(jnp.sum(raysT[3:6] ** 2, axis=0, keepdims=True))
            spacing_t = (far_t - near_t) / (n_candidates - 1)
            if ratio_quad:
                # proxy-shaped stratum quadrature (lane-major mirror of the
                # jnp epilogue below; see `quadrature` in the docstring)
                aux = sel[3]
                rho, w_tot = aux[:k], jnp.minimum(aux[k:k + 1], 0.9999)
                kk = jnp.arange(k, dtype=jnp.float32)[:, None]
                c0 = kk / k * w_tot                          # (k, Rp)
                c1 = (kk + 1.0) / k * w_tot
                tau_p = jnp.log(jnp.maximum(1.0 - c0, 1e-7)
                                / jnp.maximum(1.0 - c1, 1e-7))
                sig_impl = rho * w_tot / jnp.maximum(
                    1.0 - (kk + 0.5) / k * w_tot, 1e-7)
                ratio = (jax.nn.relu(sig_kr) * dirn_t
                         / jnp.maximum(sig_impl, 1e-7))
                alphas = 1.0 - jnp.exp(-jnp.clip(ratio, 0.0, 1e3) * tau_p)
            else:
                deltas = jnp.concatenate(
                    [zs[1:] - zs[:-1], jnp.broadcast_to(spacing_t, (1, rp))],
                    axis=0) * dirn_t
                alphas = 1.0 - jnp.exp(-deltas * jax.nn.relu(sig_kr))
            trans = jnp.cumprod(1.0 - alphas + 1e-10, axis=0)
            trans = jnp.concatenate([jnp.ones_like(trans[:1]), trans[:-1]], 0)
            weights = alphas * trans                             # (k, Rp)
            opacity = jnp.sum(weights, axis=0)
            rgb = jnp.einsum("kr,ckr->rc", weights, rgb_kr)
            if white_back:
                rgb = rgb + (1.0 - opacity[:, None])
            depth = jnp.sum(weights * zs, axis=0)
            return rgb, depth, opacity, zs, weights, rgb_kr

        assert n_keep % 2 == 0 and (n_keep * tile) % TILE_N == 0, \
            "fused pdf path needs even n_keep"
        assert not (return_samples and (cull is not None
                                        or adaptive is not None)), \
            "return_samples is unsupported with cull/adaptive"
        pad_r = -r % tile
        rays8 = jnp.concatenate([rays[:, :6], near, far], axis=1)
        rays8 = jnp.pad(rays8, ((0, pad_r), (0, 0)))
        rp = r + pad_r

        if cull is not None:
            assert adaptive is None, "cull and adaptive are exclusive"
            n_act = max(tile, (int(cull * rp) + tile - 1) // tile * tile)
            n_act = min(n_act, rp)
            opac_hat = proxy_march.proxy_opacity(
                packed_proxy, rays8.T, n_candidates)            # (Rp,)
            opac_hat = jnp.where(jnp.arange(rp) < r, opac_hat, -1.0)
            idx_act = jnp.argsort(-opac_hat)[:n_act]
            rgb_a, depth_a, opac_a = fused_pdf(rays8[idx_act].T, n_keep)[:3]
            bg = 1.0 if white_back else 0.0
            rgb = jnp.full((rp, 3), bg, jnp.float32).at[idx_act].set(rgb_a)
            depth = jnp.zeros((rp,), jnp.float32).at[idx_act].set(depth_a)
            opacity = jnp.zeros((rp,), jnp.float32).at[idx_act].set(opac_a)
            return {f"rgb_{model}": rgb[:r], f"depth_{model}": depth[:r],
                    f"opacity_{model}": opacity[:r]}

        rgb, depth, opacity, zs, w_kr, rgb_kr = fused_pdf(rays8.T, n_keep)

        if adaptive is not None:
            hi_frac, k_hi = adaptive
            assert k_hi % 2 == 0, "adaptive k_hi must be even"
            n_hi = max(tile, (int(hi_frac * rp) + tile - 1) // tile * tile)
            n_hi = min(n_hi, rp)
            # ambiguity = world-space spread of the selected depths, gated
            # by opacity: background rays have a near-uniform proxy CDF
            # (huge spread) but nothing to composite — don't spend on them
            dirn_r = jnp.sqrt(jnp.sum(rays8[:, 3:6] ** 2, axis=1))
            amb = (zs[-1] - zs[0]) * dirn_r * opacity
            amb = jnp.where(jnp.arange(rp) < r, amb, -1.0)  # pad rows last
            # full argsort + slice: bitonic sort is milliseconds on TPU,
            # lax.top_k at this size is not (measured round 1)
            idx_hi = jnp.argsort(-amb)[:n_hi]
            rgb_hi, depth_hi, opac_hi = fused_pdf(rays8[idx_hi].T, k_hi)[:3]
            rgb = rgb.at[idx_hi].set(rgb_hi)
            depth = depth.at[idx_hi].set(depth_hi)
            opacity = opacity.at[idx_hi].set(opac_hi)

        out = {f"rgb_{model}": rgb[:r], f"depth_{model}": depth[:r],
               f"opacity_{model}": opacity[:r]}
        if return_samples:
            out["z_samples"] = zs.T[:r]                       # (R, K)
            out["w_samples"] = w_kr.T[:r]                     # (R, K)
            out["rgb_samples"] = rgb_kr.transpose(2, 1, 0)[:r]  # (R, K, 3)
        return out

    # coarse uniform candidates → keep the highest expected-weight depths
    t = jnp.linspace(0.0, 1.0, n_candidates)
    z = near * (1 - t) + far * t                                  # (R, S)
    spacing = (far - near) / (n_candidates - 1)                   # (R, 1)

    quad_rho = quad_w = None
    if select == "pdf":
        from nerf_siren_tpu.ops.sample_pdf import sample_pdf

        w_hat = proxy_weights(z, spacing)
        z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
        if quadrature == "ratio":
            assert placement == "mid", \
                "quadrature='ratio' needs equal-mass strata (placement='mid')"
            # inverse CDF at ascending strata-centered u is already sorted;
            # sorting would misalign the per-sample densities
            z_sel, quad_rho = sample_pdf(
                z_mid, w_hat[:, 1:-1], n_keep, rng=None, det=True,
                midpoint=True, return_density=True)
            # W in the c->T map must match the placement CDF's total mass
            # (incl. its eps floor); clamp away the tau blow-up at W->1
            quad_w = jnp.minimum(
                jnp.sum(w_hat[:, 1:-1] + 1e-5, -1, keepdims=True), 0.9999)
        else:
            z_sel = sample_pdf(z_mid, w_hat[:, 1:-1], n_keep, rng=None,
                               det=True, midpoint=placement == "mid")
            z_sel = jnp.sort(z_sel, axis=-1)
    elif refine_mult > 1:
        # hierarchical refinement: split each survivor interval into
        # refine_mult sub-candidates and re-rank by expected weight.
        # NOTE: measured WORSE than single-stage at convergence (28.5 dB →
        # 21.7 dB agreement at x2): the refined keeps collapse into one or
        # two surface intervals, losing coverage of secondary crossings.
        # Default refine_mult=1; kept for experimentation.
        z_coarse = weight_top_k(z, spacing, n_keep)               # (R, K)
        offs = (jnp.linspace(-0.5, 0.5, refine_mult + 1)[:-1]
                + 0.5 / refine_mult)                              # (m,)
        z_sub = (z_coarse[..., None] + offs * spacing[..., None])  # (R, K, m)
        z_sub = jnp.sort(z_sub.reshape(z_sub.shape[0], -1), axis=-1)
        z_sel = weight_top_k(z_sub, spacing / refine_mult, n_keep)
        spacing = spacing / refine_mult
    else:
        z_sel = weight_top_k(z, spacing, n_keep)
    # 4. full model at the survivors
    if packed_params is not None:
        from nerf_siren_tpu.ops.pallas import fused_mlp
        from nerf_siren_tpu.ops.pallas.fused_mlp import IN_ROWS, SIGMA_ROW

        fused_full_t = _field_kernel_for(packed_params[model])
        oT8 = jnp.pad(rays_o.T, ((0, IN_ROWS - 3), (0, 0)))
        dT8 = jnp.pad(rays_d.T, ((0, IN_ROWS - 3), (0, 0)))
        n_pts = r * n_keep
        xyzT = (oT8[:, :, None] + dT8[:, :, None] * z_sel[None]).reshape(
            IN_ROWS, n_pts)
        dirT = jnp.broadcast_to(dT8[:, :, None],
                                (IN_ROWS, r, n_keep)).reshape(IN_ROWS, n_pts)
        pad = -n_pts % fused_mlp.TILE_N
        out8 = fused_full_t(packed_params[model],
                            jnp.pad(xyzT, ((0, 0), (0, pad))),
                            jnp.pad(dirT, ((0, 0), (0, pad))),
                            depth=nerf_cfg.depth, skips=nerf_cfg.skips)
        out8 = out8[:, :n_pts]
        sigmas_raw = out8[SIGMA_ROW].reshape(r, n_keep)
        rgb_t = out8[:3].reshape(3, r, n_keep)          # (3, R, K)
        rgb_raw = None
    else:
        xyz_sel = rays_o[:, None, :] + rays_d[:, None, :] * z_sel[..., None]
        dir_emb = positional_encoding(rays_d, n_freqs_dir)
        dir_b = jnp.broadcast_to(dir_emb[:, None, :],
                                 (r, n_keep, dir_emb.shape[-1]))
        emb = positional_encoding(xyz_sel, n_freqs_xyz)
        raw = apply_nerf(params[model], emb, dir_b, cfg=nerf_cfg,
                         compute_dtype=compute_dtype)
        sigmas_raw = raw[..., 3]
        rgb_raw = raw[..., :3]

    sigmas = jax.nn.relu(sigmas_raw)
    if quad_rho is not None:
        # proxy-shaped stratum quadrature (see `quadrature` in the
        # docstring): stratum proxy optical depth in closed form, scaled
        # by the field / implied-proxy density ratio at the sample
        kk = jnp.arange(n_keep, dtype=jnp.float32)
        c0 = kk / n_keep * quad_w                              # (R, K)
        c1 = (kk + 1.0) / n_keep * quad_w
        tau_p = jnp.log(jnp.maximum(1.0 - c0, 1e-7)
                        / jnp.maximum(1.0 - c1, 1e-7))
        u_mid = (kk + 0.5) / n_keep
        # implied optical depth per unit z at the sample: W*rho/(1-uW);
        # the proxy CDF was marched in world distance (dz * |d|), so the
        # field side carries the same dir_norm factor
        sig_impl = quad_rho * quad_w / jnp.maximum(1.0 - u_mid * quad_w, 1e-7)
        ratio = sigmas * dir_norm / jnp.maximum(sig_impl, 1e-7)
        alphas = 1.0 - jnp.exp(-jnp.clip(ratio, 0.0, 1e3) * tau_p)
    else:
        # composite with NeRF's nonuniform quadrature: consecutive-
        # difference deltas over the kept (sorted) depths, final delta =
        # one candidate interval. Constant tiny deltas systematically
        # under-integrate density at surfaces (measured -11 dB at
        # convergence).
        deltas = jnp.concatenate(
            [z_sel[:, 1:] - z_sel[:, :-1],
             jnp.broadcast_to(spacing, (z_sel.shape[0], 1))],
            axis=-1) * dir_norm
        alphas = 1.0 - jnp.exp(-deltas * sigmas)
    trans = jnp.cumprod(1.0 - alphas + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
    weights = alphas * trans
    opacity = jnp.sum(weights, -1)
    if rgb_raw is not None:
        rgb = jnp.sum(weights[..., None] * rgb_raw, -2)
    else:
        rgb = jnp.sum(weights[None, :, :] * rgb_t, -1).T
    if white_back:
        rgb = rgb + (1.0 - opacity[..., None])
    depth = jnp.sum(weights * z_sel, -1)
    out = {f"rgb_{model}": rgb, f"depth_{model}": depth,
           f"opacity_{model}": opacity}
    if return_samples:
        out["z_samples"] = z_sel
        out["w_samples"] = weights
        out["rgb_samples"] = (rgb_raw if rgb_raw is not None
                              else rgb_t.transpose(1, 2, 0))
    return out


def make_edge_refined_renderer(
    base_render: Callable[[jax.Array], Dict[str, jax.Array]],
    packed: Dict[str, Any],
    img_hw: Tuple[int, int],
    *,
    nerf_cfg: NeRFConfig = NeRFConfig(),
    white_back: bool = False,
    n_samples: int = 48,
    n_importance: int = 16,
    cap_frac: float = 0.04,
    thr: float = 0.03,
    chunk: int = 8192,
    model: str = "fine",
) -> Callable[[jax.Array], Dict[str, jax.Array]]:
    """Silhouette-edge refinement pass over any full-frame fast renderer.

    Round-5 finding (docs/fast_gap_diagnosis.json): the fast path's 0.4-0.5 dB
    GT deficit vs the exact render is NOT diffuse quadrature error — 96.4% of
    the fast-vs-exact squared error lives in the 2.7% of pixels on
    silhouette/depth edges, where grazing rays cross surfaces tangentially
    and K CDF-placed samples cannot resolve the crossing. Every volumetric
    fix measured a dead end: trapezoid/supersampled interval optical depth
    collapses the image (17/19 dB — accurate absorption gets attributed to
    the empty-space sample BEFORE the surface, compositing unconstrained
    rgb; the left-rectangle delta rule is load-bearing), uniform coverage
    and CDF floors cost quality, two-stage hierarchical resampling saturates
    at -0.29 dB, and K/C scaling saturates at -0.39.

    What does hold the +-0.1 dB bar is the reference algorithm itself at
    reduced counts: exact 48+16 renders +0.03 dB mean / -0.075 worst-pose
    vs the full 64+64 render (4-pose cluster measurement). So: render the
    frame fast, detect the edge band on the fast render's own opacity/depth
    maps (image-space 4-neighbor gradients + one 3x3 dilation), gather the
    top `cap_frac` of rays by edge score, re-render ONLY those through the
    exact-lite fused path (render_rays_fused at n_samples+n_importance),
    and scatter the result back. Expected-cost arithmetic: 4% of rays at
    ~90 eval-units over a K=16 base is ~+28% frame cost for a ~10x drop in
    fast-vs-exact error power.

    The refinement is ONE additional jitted program per frame (static
    n_edge capacity), device-resident end to end — no host sync between the
    base render and the refinement. Rays must be a full scanline-ordered
    (H*W, 8) frame matching `img_hw`.

    Reference surface: this replaces nothing in the reference — it is the
    TPU-native answer to the driver's speed-at-parity bar
    (reference README.md:136-145 claims speed; models/rendering.py:162-190
    defines the quadrature both paths share).
    """
    H, W = img_hw
    rp = H * W
    chunk = min(chunk, rp)
    n_edge = max(chunk, -(-int(cap_frac * rp) // chunk) * chunk)
    n_edge = min(n_edge, rp // chunk * chunk)
    from nerf_siren_tpu.render.fused import render_rays_fused
    cfg_lite = RenderConfig(
        n_samples=n_samples, n_importance=n_importance, perturb=0.0,
        noise_std=0.0, white_back=white_back, test_time=True)

    @jax.jit
    def refine(rays, rgb, depth, opacity):
        o = opacity.reshape(H, W)
        doz = (depth * opacity).reshape(H, W)

        def grad4(m):
            dx = jnp.abs(jnp.diff(m, axis=1))
            dy = jnp.abs(jnp.diff(m, axis=0))
            z1 = jnp.zeros((H, 1), m.dtype)
            z0 = jnp.zeros((1, W), m.dtype)
            return jnp.maximum(
                jnp.maximum(jnp.concatenate([dx, z1], 1),
                            jnp.concatenate([z1, dx], 1)),
                jnp.maximum(jnp.concatenate([dy, z0], 0),
                            jnp.concatenate([z0, dy], 0)))

        g = jnp.maximum(grad4(o), 0.5 * grad4(doz))
        # one 3x3 dilation widens the band to cover both edge flanks
        g = jax.lax.reduce_window(g, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                  "SAME")
        score = g.reshape(-1)
        idx = jax.lax.slice_in_dim(jnp.argsort(-score), 0, n_edge)
        valid = score[idx] > thr
        rays_e = rays[idx]
        tiles = rays_e.reshape(n_edge // chunk, chunk, 8)
        out_e = jax.lax.map(
            lambda t: render_rays_fused(packed, t, cfg_lite,
                                        nerf_cfg=nerf_cfg), tiles)
        rgb_e = out_e["rgb_fine"].reshape(n_edge, 3)
        depth_e = out_e["depth_fine"].reshape(n_edge)
        opac_e = out_e["opacity_fine"].reshape(n_edge)
        rgb = rgb.at[idx].set(jnp.where(valid[:, None], rgb_e, rgb[idx]))
        depth = depth.at[idx].set(jnp.where(valid, depth_e, depth[idx]))
        opacity = opacity.at[idx].set(jnp.where(valid, opac_e, opacity[idx]))
        n_refined = jnp.sum(valid)
        return rgb, depth, opacity, n_refined

    def render(rays: jax.Array) -> Dict[str, jax.Array]:
        assert rays.shape[0] == rp, \
            f"edge refinement needs the full {img_hw} frame"
        out = dict(base_render(rays))
        rgb, depth, opac, n_ref = refine(
            rays, out[f"rgb_{model}"], out[f"depth_{model}"],
            out[f"opacity_{model}"])
        out[f"rgb_{model}"] = rgb
        out[f"depth_{model}"] = depth
        out[f"opacity_{model}"] = opac
        render.last_refined = n_ref          # device scalar; diagnostics
        return out

    render.last_refined = None
    render.n_edge = n_edge
    return render


def estimate_scene_aabb(sigma_fn: Callable[[jax.Array], jax.Array],
                        search_min, search_max, resolution: int = 64,
                        threshold: float = 5.0, margin: float = 0.05):
    """Bounding box of the occupied region: probe a coarse sigma grid and
    take the extent of cells above `threshold`, padded by `margin` of the
    search range. Falls back to the full search box when nothing exceeds
    the threshold."""
    import numpy as np

    lo = np.asarray(search_min, np.float32)
    hi = np.asarray(search_max, np.float32)
    axes = [np.linspace(lo[i], hi[i], resolution, dtype=np.float32)
            for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    sigma = np.asarray(sigma_fn(jnp.asarray(pts))).reshape(-1)
    occ = pts[sigma > threshold]
    if len(occ) == 0:
        return lo, hi
    pad = margin * (hi - lo)
    return (np.maximum(occ.min(0) - pad, lo),
            np.minimum(occ.max(0) + pad, hi))


def make_auto_cull_renderer(
    params: Dict[str, Any],
    proxy: Dict[str, Any],
    *,
    n_candidates: int,
    n_keep: int,
    nerf_cfg: NeRFConfig,
    white_back: bool,
    packed_params: Dict[str, Any],
    packed_proxy: Dict[str, Any],
    scene_aabb=None,
    model: str = "fine",
    compute_dtype=jnp.bfloat16,
    margin: float = 1.2,
    opacity_eps="auto",                  # float, or "auto" to self-calibrate
    levels: int = 16,
    block: int = 128,
    prepass_candidates: Optional[int] = None,
    placement: str = "mid",
    quadrature: str = "delta",
    mesh=None,
) -> Callable[[jax.Array], Dict[str, jax.Array]]:
    """Frame-global empty-ray culling at ray-BLOCK granularity.

    Returns render(rays) -> dict. The fixed `cull=` fraction of
    render_rays_fast has two failure modes (both measured, BASELINE.md):
    the budget is per-TILE, so a foreground-dense tile silently drops
    occupied rays even when the frame-wide fraction is safe; and a
    fraction below the frame's true foreground coverage collapses quality
    (cull=0.55 on a 60%-foreground frame: 18.5 dB). This driver removes
    both by sizing the budget per frame, and works on blocks of `block`
    consecutive rays rather than single rays:

      1. one proxy_opacity prepass (`prepass_candidates` proxy evals/ray,
         default n_candidates) scores EVERY ray of the frame;
      2. a block is FOREGROUND if any of its rays clears `opacity_eps`;
         budget = foreground blocks * margin, rounded UP to one of
         `levels` frame-fraction buckets (bounds jit retraces; overshoot
         only costs speed);
      3. the top-budget blocks (by max ray opacity) render through the
         fused pdf path, everything else composites to background.

    opacity_eps="auto" (default) self-calibrates the threshold every
    frame: among the rays this frame actually rendered that came out
    (near-)empty (field opacity < 0.01), take the 99.5th-percentile
    PREPASS score. The proxy overpredicts density by design (phantom
    suppression), so a fixed prepass threshold is scene-dependent —
    measured on the cluster scene, eps=0.05 culls nothing while 0.30
    culls 42% of rays at zero quality cost. The first frame renders
    everything (budget + calibration both start there); frames with no
    empty rays keep the previous eps.

    Why blocks (round 3, replacing the round-2 per-ray variant): per-ray
    culling spent more than it saved on data movement — a full-frame
    argsort of 640K opacities, a (n_act, 8) random-row gather, and a
    6-operand reassembly sort (the scatter it replaced measured 36 ms per
    (Rp, 3) array; the sort itself still cost ~ms and the gather worse).
    At block granularity every one of those becomes cheap: the sort ranks
    nblocks (=rp/block) keys, and the gather/reassembly move CONTIGUOUS
    (block*8)-wide rows, which XLA lowers to fast large-row dynamic
    gathers instead of per-element scatter/gather. Eval frames are
    scanline-ordered, so foreground is contiguous and the block-level
    overhead (a block renders if ANY ray is foreground — quality can only
    improve vs per-ray at equal coverage) stays small: measured active
    fractions on the frontier scene are within a few percent of the
    per-ray budget. Block size must keep block*quantum_blocks a multiple
    of the march kernel's TILE_R.

    The budget is a traced-shape decision JAX cannot make inside jit, and
    a mid-frame host sync costs a full dispatch round-trip on tunneled
    runtimes (measured: ~70 ms of a ~115 ms frame). So the driver is
    TEMPORAL: each frame renders as ONE compiled program (prepass + block
    rank + gather + fused render + block reassembly) whose budget was
    sized from the PREVIOUS frame's foreground-block count (returned by
    that same program); the first frame renders every ray — safe by
    construction. The count stays a device array until the NEXT frame
    starts (int() there is cheap — the producing program has long
    completed); fetching it at the end of its own frame would cost a
    second dispatch round-trip per frame (measured: 1.26M → ~4M rays/s).
    Eval-style pose sequences change foreground coverage smoothly, and
    `margin` absorbs the frame-to-frame drift; a scene cut is at worst
    one frame at the stale budget, self-corrected on the next. Eval
    drives frames through this; the in-jit per-tile `cull=` remains for
    fully-jitted pipelines whose tile statistics are known.

    Dense-frame bypass (round 4): when the previous frame's budget covers
    more blocks than the measured break-even fraction (~0.68 — the
    prepass/rank/reassembly apparatus costs ≈0.32 of a plain frame on
    both r3 scenes; see PLAIN_ENTER below), culling can only lose
    (measured r3: spheres act 0.83 auto 4.06M vs plain 4.68M rays/s;
    EG3D act=1.0 frames strictly slower) — such frames render through a
    plain ordered-tile program with ZERO auto-cull cost (no prepass — the
    r4 ablation measured even a prepass+calibration-only bypass at 0.80x
    plain). Plain mode watches for the scene turning sparse via the
    field-visible block count (~µs) scaled by the field->proxy ratio
    measured on the last culled frame; crossing PLAIN_EXIT schedules one
    FULL culled frame that re-measures budget and eps with the real
    prepass, so budget decisions only ever rest on prepass-measured
    counts (a plain frame's field counts never feed the culled budget —
    that shortcut measurably culled real foreground). Hysteresis
    (EXIT < ENTER) keeps boundary jitter from flapping compiled programs.
    Auto mode therefore matches plain-K on dense scenes and keeps the
    cull win on sparse ones."""
    from nerf_siren_tpu.ops.pallas import proxy_march

    tile = proxy_march.TILE_R
    prepass_c = prepass_candidates or n_candidates
    assert tile % block == 0, f"block must divide TILE_R={tile}"
    blocks_per_tile = tile // block
    common = dict(n_candidates=n_candidates, n_keep=n_keep,
                  nerf_cfg=nerf_cfg, white_back=white_back, placement=placement,
                  compute_dtype=compute_dtype, scene_aabb=scene_aabb,
                  select="pdf", packed_params=packed_params,
                  packed_proxy=packed_proxy, model=model, quadrature=quadrature)

    n_dev = 1 if mesh is None else mesh.shape["data"]

    def _wrap(run):
        """jit single-device; shard_map over the data mesh otherwise —
        per-shard budgets (VERDICT r4 item 2): every shard ranks/culls its
        own contiguous slab, budget scalars come back per shard, and the
        host sizes the next frame's static budget from the MAX across
        shards (conservative: sparse shards render a few extra background
        blocks, quality is never at risk)."""
        if mesh is None:
            return jax.jit(run)
        from jax.sharding import PartitionSpec as P

        from nerf_siren_tpu.parallel.shard_train import shard_map_compat
        return jax.jit(shard_map_compat(
            run, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data"), P("data"))))

    @functools.lru_cache(maxsize=None)
    def frame_program(n_act_b: int, chunk_b: int, rp: int, r: int):
        # rp/r: per-shard padded rows / GLOBAL valid count (shards compare
        # global row ids against r, so the last shard masks its padding)
        nblocks = rp // block
        bg = 1.0 if white_back else 0.0

        def run(rays, eps_in):
            # pad INSIDE the program: on the tunneled runtime every eager
            # dispatch (pad, output slices) costs a host round trip
            eps_in = eps_in.reshape(())
            gid0 = 0 if mesh is None else jax.lax.axis_index("data") * rp
            rays8 = jnp.pad(rays, ((0, rp - rays.shape[0]), (0, 0)))
            opac = proxy_march.proxy_opacity(
                packed_proxy, rays8.T, prepass_c)            # (Rp,)
            opac = jnp.where(jnp.arange(rp) + gid0 < r, opac, -1.0)
            score = jnp.max(opac.reshape(nblocks, block), axis=1)
            order = jnp.argsort(-score)                      # (nblocks,)
            act = rays8.reshape(nblocks, block * 8)[order[:n_act_b]]
            act = act.reshape(n_act_b * block, 8)
            tiles = act.reshape(n_act_b // chunk_b, chunk_b * block, 8)
            out = jax.lax.map(
                lambda t: render_rays_fast(params, proxy, t, **common),
                tiles)
            out = {k: v.reshape(n_act_b * block, *v.shape[2:])
                   for k, v in out.items()}
            if auto_eps:
                # self-calibrate the foreground threshold from THIS frame:
                # among rendered rays that came out (near-)empty, find the
                # 99.5th-percentile PREPASS score — a cull threshold that
                # would have mislabeled <=0.5% of provably-empty rays. The
                # proxy overpredicts density by design, so a fixed true-
                # opacity eps maps to a scene-dependent prepass value
                # (measured: eps=0.05 culls nothing, 0.30 culls 42% at
                # zero quality cost on the cluster scene). Active rays
                # include the cull boundary, exactly where calibration
                # matters; if no empty rays rendered, keep the old eps.
                bid = order[:n_act_b]
                rid = bid[:, None] * block + jnp.arange(block)[None] + gid0
                valid = (rid < r).reshape(-1)
                act_pre = opac.reshape(nblocks, block)[order[:n_act_b]]
                pre_flat = act_pre.reshape(-1)
                field_op = out[f"opacity_{model}"]
                # TWO-SIDED calibration (round-3 fix): the empty-ray
                # quantile alone bounds only the false-POSITIVE rate —
                # occupied rays the proxy under-scores still fall below it
                # and get culled (measured on the spheres scene: eps=auto
                # culled 28% and the worst pose collapsed 30.9 -> 24.3 dB).
                # Also take a low quantile of the prepass score among rays
                # that rendered VISIBLY (field opacity > 0.05) and use the
                # smaller of the two: never above a level that would have
                # dropped >0.5% of this frame's visible rays.
                empty = (field_op < 0.01) & valid
                occ = (field_op > 0.05) & valid
                # 1-of-8 subsample before the quantiles: nanquantile sorts
                # its whole input, and two full-frame (640K) sorts cost
                # real ms; quantiles of an 80K systematic sample are
                # statistically identical for calibration purposes
                sub = lambda v: v.reshape(-1, 8)[:, 0]  # noqa: E731
                pre_s = sub(pre_flat)
                eps_emp = jnp.nanquantile(
                    jnp.where(sub(empty), pre_s, jnp.nan), 0.995)
                eps_occ = jnp.nanquantile(
                    jnp.where(sub(occ), pre_s, jnp.nan), 0.005)
                eps_cal = jnp.nanmin(jnp.stack([eps_emp, eps_occ]))
                # clip BEFORE the fallback select: clipping after would
                # collapse the keep-previous-eps value (e.g. the frame-1
                # cull-nothing 2.0) to 0.95 on any frame with no empty rays
                eps_cal = jnp.clip(eps_cal, 1e-4, 0.95)
                eps_next = jnp.where(jnp.isnan(eps_cal), eps_in, eps_cal)
            else:
                eps_next = eps_in
            # sentinel eps (>1 = "not yet calibrated") budgets EVERY real
            # block (padded blocks score -1), not zero blocks: cull nothing
            # until a real threshold exists
            thr = jnp.where(eps_next > 1.0, -0.5, eps_next)
            n_fg_b = jnp.sum(score > thr)                    # next budget
            # block reassembly: payload row per rendered block + one
            # background row; inverse-permutation row gather puts every
            # block back (rows are 5*block wide — a large-row gather,
            # not the per-element scatter/sort the per-ray variant paid)
            rgb_a = out[f"rgb_{model}"].reshape(n_act_b, block, 3)
            payload = jnp.concatenate(
                [rgb_a.reshape(n_act_b, block * 3),
                 out[f"depth_{model}"].reshape(n_act_b, block),
                 out[f"opacity_{model}"].reshape(n_act_b, block)], axis=1)
            bg_row = jnp.concatenate(
                [jnp.full((block * 3,), bg, jnp.float32),
                 jnp.zeros((2 * block,), jnp.float32)])
            payload = jnp.concatenate([payload, bg_row[None]], axis=0)
            inv = jnp.argsort(order)                         # rank of block b
            take = jnp.where(inv < n_act_b, inv, n_act_b)
            full = payload[take]                             # (nblocks, 5B)
            rgb = full[:, :block * 3].reshape(rp, 3)
            depth = full[:, block * 3: block * 4].reshape(rp)
            opacity = full[:, block * 4:].reshape(rp)
            # field-visible blocks among the RENDERED blocks (culled blocks
            # are presumed background, so this is the whole frame's count):
            # the numerator of the field->proxy ratio plain mode uses for
            # exit detection
            rid_act = (order[:n_act_b][:, None] * block
                       + jnp.arange(block)[None] + gid0).reshape(-1)
            vis = (out[f"opacity_{model}"] > 0.01) & (rid_act < r)
            n_vis_b = jnp.sum(jnp.any(vis.reshape(n_act_b, block), axis=1))
            r_local = rp if mesh is not None else r
            return ({f"rgb_{model}": rgb[:r_local],
                     f"depth_{model}": depth[:r_local],
                     f"opacity_{model}": opacity[:r_local]},
                    n_fg_b[None], eps_next[None], n_vis_b[None])
        return _wrap(run)

    @functools.lru_cache(maxsize=None)
    def plain_program(n_act_b: int, chunk_b: int, rp: int, r: int):
        """Dense-frame path: NO prepass, no rank/sort, no gather, no
        reassembly — bit-identical output to render_rays_fast over ordered
        tiles, at its cost (the r4 on-chip ablation measured the
        prepass+calibration variant of this program at 0.80x plain —
        the proxy march is not cheap at frame scale).

        The only extra work is the field-visibility block count (a
        reshape+any+sum, ~µs), which drives plain-mode EXIT detection:
        a plain frame never feeds the CULLED budget directly (that was
        the first bypass attempt, and it culled real foreground —
        worst pose 30.9 -> 21.1 dB on-chip, because field-opacity counts
        and proxy-score counts live in different spaces). Instead the
        caller estimates the proxy-space active fraction via the
        field->proxy ratio measured on the last culled frame, and when
        that estimate crosses PLAIN_EXIT it schedules a FULL culled
        frame, which re-measures budget and eps with the real prepass —
        so every frame any budget decision rests on is prepass-measured,
        and transition frames render every block (zero quality risk)."""
        nblocks = n_act_b

        def run(rays, eps_in):
            eps_in = eps_in.reshape(())
            gid0 = 0 if mesh is None else jax.lax.axis_index("data") * rp
            rays8 = jnp.pad(rays, ((0, rp - rays.shape[0]), (0, 0)))
            tiles = rays8.reshape(nblocks // chunk_b, chunk_b * block, 8)
            out = jax.lax.map(
                lambda t: render_rays_fast(params, proxy, t, **common),
                tiles)
            out = {k: v.reshape(rp, *v.shape[2:]) for k, v in out.items()}
            vis = ((out[f"opacity_{model}"] > 0.01)
                   & (jnp.arange(rp) + gid0 < r))
            n_vis_b = jnp.sum(jnp.any(vis.reshape(nblocks, block), axis=1))
            r_local = rp if mesh is not None else r
            return ({k: v[:r_local] for k, v in out.items()},
                    n_vis_b[None], eps_in[None])
        if mesh is None:
            return jax.jit(run)
        from jax.sharding import PartitionSpec as P

        from nerf_siren_tpu.parallel.shard_train import shard_map_compat
        return jax.jit(shard_map_compat(
            run, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=(P("data"), P("data"), P("data"))))

    auto_eps = opacity_eps == "auto"
    # Dense-frame bypass thresholds (round 4, VERDICT r3 item 4): at high
    # active fractions the prepass + argsort + gather/reassembly machinery
    # costs more than the few culled blocks save (measured r3: spheres
    # K=16 auto 4.06M vs plain 4.68M rays/s; EG3D act=1.0 pure overhead).
    # Above PLAIN_ENTER the frame renders through plain_program — zero
    # auto-cull overhead, so auto ≥ plain-K by construction on dense
    # scenes. The threshold is the measured BREAK-EVEN, not "nearly
    # dense": fitting time = act·T_plain + OH to the r3 frontier rows
    # (spheres act 0.83 → 4.06M vs plain 4.68M; cluster act 1.0 → 3.60M
    # vs act 0.53 → 5.47M, both K=16) gives OH ≈ 0.32·T_plain on both
    # scenes, so culling only pays below act ≈ 0.68. Hysteresis
    # (EXIT < ENTER) so block-count jitter at the boundary does not flap
    # programs (each flap costs a compile).
    PLAIN_ENTER = 0.70
    PLAIN_EXIT = 0.65
    # previous frame's block counts + calibrated eps (device arrays);
    # `ratio` is the field-visible -> proxy-foreground block-count ratio
    # measured on the last culled/full frame (proxy overpredicts, so
    # ratio >= 1) — plain frames multiply their cheap field count by it
    # to estimate the proxy-space active fraction without a prepass
    budget = {"n_fg_b": None, "n_vis_b": None, "plain": False, "ratio": 1.0,
              "plain_run": 0,
              "eps": None if auto_eps
              else jnp.full((n_dev,), float(opacity_eps), jnp.float32)}
    # field->proxy ratio ceiling: with n_vis_b==0 on the measuring culled
    # frame the raw ratio degenerates to n_fg_b (ADVICE r4) and a scene
    # that turns sparse could stay pinned in plain mode; the proxy
    # overpredicts by design ~16x, so anything much above that is the
    # degenerate case, not signal. A periodic forced re-probe (below)
    # bounds the staleness of ratio/eps regardless.
    RATIO_MAX = 32.0
    PLAIN_REPROBE_EVERY = 64

    def render(rays: jax.Array) -> Dict[str, jax.Array]:
        r = rays.shape[0]
        # mesh mode: rp is PER-SHARD padded rows; budget scalars come back
        # per shard, and static program sizes are the conservative MAX
        if n_dev > 1:
            per = -(-r // n_dev)
            rp = -(-per // tile) * tile
        else:
            rp = r + (-r % tile)
        nblocks = rp // block
        # budget quantum in blocks; chunk_b*block stays a TILE_R multiple
        quantum_b = -(-nblocks // (levels * blocks_per_tile)) * blocks_per_tile

        def quantized_act(fg_b):
            return max(quantum_b,
                       -(-int(fg_b * margin) // quantum_b) * quantum_b)

        plain = False
        if budget["n_fg_b"] is None:
            # first frame (or forced re-probe after a plain exit): the FULL
            # culled program — renders every ray AND measures budget, eps,
            # and the field->proxy ratio via the real prepass
            n_act_b = nblocks
            if budget["eps"] is None:
                budget["eps"] = jnp.full((n_dev,), 2.0, jnp.float32)
                # frame-1 fallback: cull nothing until calibrated
        elif budget["plain"]:
            # exit check on the PREVIOUS plain frame's vis count — a
            # deferred fetch of an already-computed scalar, NOT a sync on
            # the in-flight frame (the synchronous variant measured 0.73x
            # plain on the tunnel: the fetch serialized every frame)
            n_act_b = nblocks
            plain = True
            budget["plain_run"] += 1
            if budget["plain_run"] >= PLAIN_REPROBE_EVERY:
                # bounded staleness (ADVICE r4): ratio/eps only refresh on
                # culled frames, so force one FULL culled re-probe after a
                # long plain run — costs nothing in quality (it renders
                # every block) and re-measures budget/eps/ratio
                plain = False
            elif budget["n_vis_b"] is not None:
                import numpy as _np
                est_fg_b = float(_np.max(
                    _np.asarray(budget["n_vis_b"], _np.float64)
                    * budget["ratio"]))
                if quantized_act(est_fg_b) / nblocks < PLAIN_EXIT:
                    # scene turned sparse: run the FULL culled program NOW
                    # (renders every block; re-measures budget/eps/ratio)
                    plain = False
        else:
            import numpy as _np
            fg_arr = _np.asarray(budget["n_fg_b"], _np.float64)   # deferred
            vis_arr = _np.asarray(budget["n_vis_b"], _np.float64)
            budget["ratio"] = _np.minimum(
                fg_arr / _np.maximum(vis_arr, 1.0), RATIO_MAX)
            n_act_b = quantized_act(int(fg_arr.max()))
            plain = n_act_b / nblocks >= PLAIN_ENTER
        budget["plain"] = plain
        if not plain:
            budget["plain_run"] = 0
        if plain or n_act_b >= nblocks:
            # full/plain frame: pad up to a quantum_b multiple rather
            # than growing the chunk toward a divisor of nblocks — that
            # search escalates to the WHOLE frame in one lax.map step when
            # nblocks has no small divisors past blocks_per_tile (800²,
            # block=128: nblocks=5008=16·313 with 313 prime)
            nblocks = -(-nblocks // quantum_b) * quantum_b
            rp = nblocks * block                 # multiple of tile: quantum_b
            n_act_b, chunk_b = nblocks, quantum_b  # is a blocks_per_tile mult
        else:
            chunk_b = quantum_b
        rays_j = jnp.asarray(rays, jnp.float32)  # pad/slice live in-program
        if n_dev > 1:
            # host-pad to the global padded size and shard the slabs; every
            # shard's program pads its own slab tail no further (rp rows)
            from nerf_siren_tpu.parallel.mesh import shard_rays
            rays_j = jnp.pad(rays_j, ((0, rp * n_dev - r), (0, 0)))
            rays_j = shard_rays(rays_j, mesh)
            eps_dev = shard_rays(jnp.asarray(budget["eps"]), mesh)
        else:
            eps_dev = jnp.asarray(budget["eps"])
        if plain:
            out, budget["n_vis_b"], _ = plain_program(
                n_act_b, chunk_b, rp, r)(rays_j, eps_dev)
        else:
            out, budget["n_fg_b"], budget["eps"], budget["n_vis_b"] = \
                frame_program(n_act_b, chunk_b, rp, r)(rays_j, eps_dev)
        if n_dev > 1:
            out = {k: v[:r] for k, v in out.items()}
        for key in ("n_fg_b", "n_vis_b"):
            # start the host copy NOW (async, completes when the frame
            # does): next frame's int() then reads a host-resident value
            # instead of paying a blocking round trip per frame — the last
            # ~20% gap between plain-bypass and raw-plain throughput on
            # the tunnel was exactly this fetch
            if hasattr(budget[key], "copy_to_host_async"):
                budget[key].copy_to_host_async()
        render.last_active_frac = n_act_b / nblocks   # diagnostics
        render.last_plain = plain
        render.last_eps = budget["eps"]
        return out

    render.last_active_frac = None
    render.last_plain = None
    render.last_eps = None
    return render
