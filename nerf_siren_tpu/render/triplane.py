"""EG3D triplane volume renderer (reference: volumetric_rendering/renderer.py,
ray_marcher.py, math_utils.py; eg3d_training/triplane.py, eg3d_renderer.py).

Pipeline parity:
- 3 axis-aligned plane bases (generate_planes), projection via the inverse
  plane matrices, coords scaled by 2/box_warp, bilinear zero-padded
  grid_sample of the (3, 32, 256, 256) feature planes,
- OSGDecoder: mean over planes → FC(32→64) softplus → FC(64→4),
  rgb = sigmoid(x)·1.002 − 0.001 (MipNeRF clamp), raw sigma,
- MipRayMarcher2: midpoint colors/densities/depths, softplus(σ−1) clamp,
  alpha compositing, depth normalized by weight sum → nan→inf → clamped to
  the depth range, optional white background,
- ImportanceRenderer: auto ray-box limits when ray_start='auto', stratified
  coarse samples, coarse march, max/avg-pool-smoothed weights + 0.01 floor →
  hierarchical sample_pdf → sorted union of samples → fine march,
- TriPlaneGenerator: StyleGAN2 backbone (img 256², 96ch → 3×32 planes),
  mapping with c-conditioning zeroing, sample()/sample_mixed() for σ-grid
  queries (mesh extraction),
- EG3DRenderer: single learnable latent z (reference eg3d_renderer.py:39),
  hardcoded rendering kwargs (depth 64+64, ray 0.1→10, box_warp 15,
  clamp softplus).

TPU-first: all functions are pure and jit-compilable; the reference's
per-axis index_select/gather sort machinery becomes vectorized sorts; the
batch of rays can be sharded on the mesh's data axis like the NeRF path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_siren_tpu.models.stylegan2 import (
    GeneratorConfig,
    apply_fc,
    apply_mapping,
    apply_synthesis_network,
    init_fc,
    init_generator,
    mapping_pre_broadcast,
)
from nerf_siren_tpu.ops.grid_sample import (grid_sample_2d,
                                            grid_sample_2d_packed,
                                            pack_grid_for_block_sample)
from nerf_siren_tpu.ops.sample_pdf import sample_pdf


# -- math utils (reference: volumetric_rendering/math_utils.py) ----------------

def get_ray_limits_box(rays_o: jax.Array, rays_d: jax.Array,
                       box_side_length: float) -> Tuple[jax.Array, jax.Array]:
    """AABB slab test against the centered cube of side `box_side_length`.
    Returns (t_min, t_max) with (-1, -2) for missed rays
    (reference math_utils.py:46-98)."""
    half = box_side_length / 2.0
    invdir = 1.0 / rays_d
    lo = (-half - rays_o) * invdir
    hi = (half - rays_o) * invdir
    tsmall = jnp.minimum(lo, hi)
    tbig = jnp.maximum(lo, hi)

    tmin = jnp.max(tsmall[..., :2], axis=-1)
    tmax = jnp.min(tbig[..., :2], axis=-1)
    is_valid = ~(tsmall[..., 0] > tbig[..., 1]) & ~(tsmall[..., 1] > tbig[..., 0])
    is_valid &= ~(tmin > tbig[..., 2]) & ~(tsmall[..., 2] > tmax)
    tmin = jnp.maximum(tmin, tsmall[..., 2])
    tmax = jnp.minimum(tmax, tbig[..., 2])

    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def batched_linspace(start: jax.Array, stop: jax.Array, num: int) -> jax.Array:
    """[num, *start.shape] evenly spaced (reference math_utils.py:101-118)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape(-1, *([1] * start.ndim))
    return start[None] + steps * (stop - start)[None]


# -- plane projection (reference: renderer.py:23-65) ---------------------------

def generate_planes() -> np.ndarray:
    return np.asarray([[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
                       [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
                       [[0, 0, 1], [1, 0, 0], [0, 1, 0]]], np.float32)


def project_onto_planes(coordinates: jax.Array) -> jax.Array:
    """(N, M, 3) → (N*3, M, 2) plane-local xy coordinates."""
    planes = jnp.asarray(generate_planes())
    inv = jnp.linalg.inv(planes)                                  # (3, 3, 3)
    n, m, _ = coordinates.shape
    proj = jnp.einsum("nmc,pcd->npmd", coordinates, inv)          # (N, 3, M, 3)
    return proj[..., :2].reshape(n * 3, m, 2)


def sample_from_planes(plane_features: jax.Array, coordinates: jax.Array,
                       box_warp: float) -> jax.Array:
    """plane_features (N, 3, C, H, W), coordinates (N, M, 3) → (N, 3, M, C)."""
    n, n_planes, c, h, w = plane_features.shape
    m = coordinates.shape[1]
    feats = plane_features.reshape(n * n_planes, c, h, w)
    coords = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(coords)                            # (N*3, M, 2)
    out = grid_sample_2d(feats, proj)                             # (N*3, M, C)
    return out.reshape(n, n_planes, m, c)


def pack_planes_for_sampling(plane_features: jax.Array,
                             dtype=jnp.bfloat16) -> jax.Array:
    """(N, 3, C, H, W) → (N, 3, H+2, W+2, C) block-gather sampling table.

    One-time per synthesized frame; pairs with sample_from_packed_planes.
    A bf16 table is the measured fast path (1.64x the element gather on
    v5e, see ops/grid_sample.py); an f32 table reproduces
    sample_from_planes bitwise."""
    n, n_planes, c, h, w = plane_features.shape
    packed = pack_grid_for_block_sample(
        plane_features.reshape(n * n_planes, c, h, w), dtype)
    return packed.reshape(n, n_planes, h + 2, w + 2, c)


def sample_from_packed_planes(packed: jax.Array, coordinates: jax.Array,
                              box_warp: float) -> jax.Array:
    """sample_from_planes on a pack_planes_for_sampling table."""
    n, n_planes, hp, wp, c = packed.shape
    m = coordinates.shape[1]
    coords = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(coords)                            # (N*3, M, 2)
    out = grid_sample_2d_packed(packed.reshape(n * n_planes, hp, wp, c), proj)
    return out.reshape(n, n_planes, m, c)


def make_kernel_plane_sampler(packed: jax.Array, box_warp: float,
                              r: int, s: int = None, *, rb: int = 64, sb: int = 8,
                              miss_cap_frac: float = 0.06,
                              tile_h: int = None, tile_px: int = None):
    """Gather-free triplane sampler on the Pallas tile kernel
    (ops/pallas/triplane_gather.py) — the jnp block-gather path's 52
    M samples/s per-element issue ceiling does not apply.

    packed: pack_planes_for_sampling table (1, 3, H+2, W+2, C).
    r, s: the ray/sample grid shape of the flattened point axis
    (coordinates are ray-major (1, R*S, 3), reference renderer.py:105).
    rb, sb: group shape — rb consecutive rays x sb consecutive depths per
    kernel group (footprint-bounded because EG3D plane projections are
    orthographic: a ray's samples trace a straight uniform line).

    Returns sample(coordinates (1, R*S, 3)) -> (1, 3, R*S, C) f32, exactly
    grid_sample_2d_packed's semantics: groups whose footprint exceeds the
    tile are re-sampled through the jnp path via a fixed-capacity miss
    list (`miss_cap_frac` of groups; sampler.last_miss_groups /
    last_miss_overflow expose diagnostics as device scalars).
    """
    from nerf_siren_tpu.ops.pallas import triplane_gather as tg

    n, n_planes, hp2, wp2, c = packed.shape
    assert n == 1, "kernel sampler: batch 1 (the EG3D single-scene mode)"
    h, w = hp2 - 2, wp2 - 2
    t_h = tile_h or tg.TILE_H
    t_px = tile_px or tg.TILE_PX
    assert r % rb == 0, (r, rb)
    xq = max(128 // c, 1)
    tables = jnp.stack([
        tg.pack_plane_rowmajor(
            packed[0, p, 1:-1, 1:-1].transpose(2, 0, 1), dtype=packed.dtype,
            tile_px=t_px)
        for p in range(n_planes)])
    rows_tot, lanes_tot = tables.shape[1], tables.shape[2]
    wp_tot = lanes_tot // c
    default_s = s

    def sample(coordinates: jax.Array, s: int = None) -> jax.Array:
        s = s if s is not None else default_s
        assert s % sb == 0, (s, sb)
        g = (r // rb) * (s // sb)
        t_pts = rb * sb
        g_cap = max(1, int(miss_cap_frac * g))

        def group(x):
            # (M, ...) ray-major -> (G, T, ...) rb x sb blocks
            y = x.reshape(r // rb, rb, s // sb, sb, *x.shape[1:])
            return y.transpose(0, 2, 1, 3, *range(4, y.ndim)).reshape(
                g, t_pts, *x.shape[1:])

        def ungroup(y):
            # (G, C, T) -> (M, C)
            z = y.reshape(r // rb, s // sb, c, rb, sb)
            return z.transpose(0, 3, 1, 4, 2).reshape(r * s, c)

        coords = (2.0 / box_warp) * coordinates
        proj = project_onto_planes(coords)                    # (3, M, 2)
        outs = []
        miss_counts, overflows = [], []
        for p in range(n_planes):
            x, y = proj[p, :, 0], proj[p, :, 1]
            ix = ((x + 1) * w - 1) / 2
            iy = ((y + 1) * h - 1) / 2
            ix0 = jnp.floor(ix).astype(jnp.int32)
            iy0 = jnp.floor(iy).astype(jnp.int32)
            wx1 = ix - ix0
            wy1 = iy - iy0
            oob = ~((ix0 >= -1) & (ix0 <= w - 1)
                    & (iy0 >= -1) & (iy0 <= h - 1))
            # clamp oob indices so tile planning ignores them
            ix0c = jnp.clip(ix0, -1, w - 1)
            iy0c = jnp.clip(iy0, -1, h - 1)
            iy0g, ix0g = group(iy0c), group(ix0c)
            wy1g, wx1g = group(wy1), group(wx1)
            oobg = group(oob.astype(jnp.float32))
            big = jnp.int32(1 << 20)
            iy_min = jnp.min(jnp.where(oobg > 0.5, big, iy0g), axis=1)
            ix_min = jnp.min(jnp.where(oobg > 0.5, big, ix0g), axis=1)
            # origins quantized: rows to 8 (sublane tiling), lanes to 128
            # — Mosaic requires provably tiled dynamic-slice offsets
            ty = jnp.clip((iy_min + 1) // 8 * 8, 0, (rows_tot - t_h) // 8 * 8)
            lane_q = max(xq, -(-128 // c))
            tx_px = jnp.clip((ix_min + 1) // lane_q * lane_q, 0,
                             (wp_tot - t_px) // lane_q * lane_q)
            feats, valid = tg.triplane_gather_plane(
                tables[p], iy0g, ix0g, wy1g, wx1g, oobg,
                (ty // 8).astype(jnp.int32),
                (tx_px * c // 128).astype(jnp.int32),
                c=c, tile_h=t_h, tile_px=t_px)
            # group-capacity fallback through the jnp block-gather path
            miss_g = ~jnp.all(valid, axis=1)                  # (G,)
            sel = jax.lax.slice_in_dim(
                jnp.argsort(~miss_g), 0, g_cap)               # misses first
            projg = group(proj[p])                            # (G, T, 2)
            from nerf_siren_tpu.ops.grid_sample import grid_sample_2d_packed
            fb = grid_sample_2d_packed(
                packed[0, p][None],
                projg[sel].reshape(1, g_cap * t_pts, 2))[0]
            fb = fb.reshape(g_cap, t_pts, c).transpose(0, 2, 1)
            take = jnp.where(miss_g[sel, None, None], fb, feats[sel])
            feats = feats.at[sel].set(take)
            outs.append(ungroup(feats))
            miss_counts.append(jnp.sum(miss_g))
            overflows.append(jnp.sum(miss_g) > g_cap)
        miss_total = sum(miss_counts)
        if not isinstance(miss_total, jax.core.Tracer):
            # diagnostics only outside jit: the factory may run INSIDE a
            # jitted frame (planes synthesized per frame), where storing
            # tracers on the function object would leak them
            sample.last_miss_groups = miss_total
            sample.last_miss_overflow = jnp.any(jnp.stack(overflows))
        return jnp.stack(outs)[None]                          # (1, 3, M, C)

    sample.last_miss_groups = None
    sample.last_miss_overflow = None
    return sample


# -- OSGDecoder (reference: triplane.py:144-167) -------------------------------

def init_osg_decoder(key, n_features: int = 32, hidden: int = 64,
                     out_dim: int = 3) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_fc(k1, n_features, hidden),
            "fc2": init_fc(k2, hidden, 1 + out_dim)}


def apply_osg_decoder(params, sampled_features: jax.Array) -> Dict[str, jax.Array]:
    """sampled_features (N, 3, M, C) → {'rgb': (N, M, 3), 'sigma': (N, M, 1)}."""
    x = jnp.mean(sampled_features, axis=1)                        # (N, M, C)
    x = jax.nn.softplus(apply_fc(params["fc1"], x))
    x = apply_fc(params["fc2"], x)
    rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
    return {"rgb": rgb, "sigma": x[..., 0:1]}


# -- MipRayMarcher2 (reference: ray_marcher.py:20-63) --------------------------

def mip_ray_march(colors: jax.Array, densities: jax.Array, depths: jax.Array,
                  white_back: bool = False):
    """colors (N, R, S, C), densities (N, R, S, 1), depths (N, R, S, 1).
    Returns (rgb (N, R, C), depth (N, R, 1), weights (N, R, S-1, 1)).

    Scalar-per-sample math runs on (N, R, S) with the trailing unit dim
    squeezed: a trailing 1 tiles to 128 lanes on TPU, so every op on the
    (N, R, S, 1) layout would move 128x the bytes (the round-1 narrow-
    layout tax). Arithmetic identical to the reference formulation."""
    d = depths[..., 0]                                            # (N, R, S)
    deltas = d[:, :, 1:] - d[:, :, :-1]
    colors_mid = 0.5 * (colors[:, :, :-1] + colors[:, :, 1:])
    densities_mid = 0.5 * (densities[..., 0][:, :, :-1]
                           + densities[..., 0][:, :, 1:])
    depths_mid = 0.5 * (d[:, :, :-1] + d[:, :, 1:])

    densities_mid = jax.nn.softplus(densities_mid - 1.0)          # init bias
    alpha = 1.0 - jnp.exp(-densities_mid * deltas)                # (N, R, S-1)

    shifted = jnp.concatenate([jnp.ones_like(alpha[:, :, :1]),
                               1 - alpha + 1e-10], axis=-1)
    weights = alpha * jnp.cumprod(shifted, axis=-1)[:, :, :-1]

    composite_rgb = jnp.sum(weights[..., None] * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=-1, keepdims=True)       # (N, R, 1)
    composite_depth = jnp.sum(weights * depths_mid, axis=-1,
                              keepdims=True) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1 - weight_total
    return composite_rgb, composite_depth, weights[..., None]


# -- ImportanceRenderer (reference: renderer.py:82-256) ------------------------

@dataclasses.dataclass(frozen=True)
class RenderingOptions:
    depth_resolution: int = 64
    depth_resolution_importance: int = 64
    ray_start: Any = 0.1          # float or 'auto'
    ray_end: Any = 10.0
    box_warp: float = 15.0
    white_back: bool = False
    disparity_space_sampling: bool = False
    density_noise: float = 0.0


def sample_stratified(ray_origins, ray_start, ray_end, depth_resolution,
                      disparity: bool = False, rng=None):
    """(N, R, S, 1) depth samples (reference renderer.py:172-195)."""
    n, r, _ = ray_origins.shape
    if disparity:
        d = jnp.linspace(0, 1, depth_resolution).reshape(1, 1, -1, 1)
        d = jnp.broadcast_to(d, (n, r, depth_resolution, 1))
        delta = 1.0 / (depth_resolution - 1)
        if rng is not None:
            d = d + jax.random.uniform(rng, d.shape) * delta
        return 1.0 / (1.0 / ray_start * (1 - d) + 1.0 / ray_end * d)
    if isinstance(ray_start, jax.Array) and ray_start.ndim > 0:
        d = batched_linspace(ray_start, ray_end, depth_resolution)  # (S, N, R, 1)
        d = jnp.transpose(d, (1, 2, 0, 3))
        delta = (ray_end - ray_start) / (depth_resolution - 1)      # (N, R, 1)
        if rng is not None:
            d = d + jax.random.uniform(rng, d.shape) * delta[..., None]
    else:
        d = jnp.linspace(ray_start, ray_end, depth_resolution).reshape(1, 1, -1, 1)
        d = jnp.broadcast_to(d, (n, r, depth_resolution, 1))
        delta = (ray_end - ray_start) / (depth_resolution - 1)
        if rng is not None:
            d = d + jax.random.uniform(rng, d.shape) * delta
    return d


def sample_importance(z_vals: jax.Array, weights: jax.Array, n_importance: int,
                      rng=None) -> jax.Array:
    """Pool-smoothed hierarchical resampling (reference renderer.py:217-239)."""
    n, r, s, _ = z_vals.shape
    z = z_vals.reshape(n * r, s)
    w = weights.reshape(n * r, -1)

    # max_pool1d(kernel 2, stride 1, padding 1) then avg_pool1d(2, 1)
    w_pad = jnp.pad(w, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    w_max = jnp.maximum(w_pad[:, :-1], w_pad[:, 1:])     # (B, s+1)
    w_s = 0.5 * (w_max[:, :-1] + w_max[:, 1:])           # (B, s)
    w_s = w_s + 0.01

    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
    samples = sample_pdf(z_mid, w_s[:, 1:-1], n_importance,
                         rng=rng, det=(rng is None))
    samples = jax.lax.stop_gradient(samples)
    return samples.reshape(n, r, n_importance, 1)


def unify_samples(d1, c1, s1, d2, c2, s2):
    """Depth-sorted union of two sample sets (reference renderer.py:149-170).

    One multi-operand stable lax.sort keyed on depth carries sigma and each
    color channel along — no argsort + take_along_axis gathers (TPU-hostile
    on (N, R, S, 1) layouts), and the sort runs along the minor (lane)
    dimension. Value-identical to the gather formulation (stable ties)."""
    depths = jnp.concatenate([d1, d2], axis=-2)[..., 0]          # (N, R, S)
    sigmas = jnp.concatenate([s1, s2], axis=-2)[..., 0]
    colors = jnp.concatenate([c1, c2], axis=-2)                  # (N, R, S, C)
    ops = (depths, sigmas) + tuple(colors[..., i]
                                   for i in range(colors.shape[-1]))
    out = jax.lax.sort(ops, dimension=-1, is_stable=True, num_keys=1)
    return (out[0][..., None], jnp.stack(out[2:], axis=-1),
            out[1][..., None])


def run_model(planes, decoder_params, sample_coordinates, options: RenderingOptions,
              density_noise_rng=None, packed: bool = False, sampler=None,
              n_samples: int = None):
    """(reference renderer.py:144-150). packed=True means `planes` is a
    pack_planes_for_sampling table (the measured-faster gather layout);
    `sampler` (make_kernel_plane_sampler) overrides both with the Pallas
    tile-gather kernel (n_samples = the per-ray sample count of this
    pass, for footprint grouping)."""
    if sampler is not None:
        feats = sampler(sample_coordinates, n_samples)
    else:
        sample = sample_from_packed_planes if packed else sample_from_planes
        feats = sample(planes, sample_coordinates, options.box_warp)
    out = apply_osg_decoder(decoder_params, feats)
    if options.density_noise > 0 and density_noise_rng is not None:
        out["sigma"] = out["sigma"] + jax.random.normal(
            density_noise_rng, out["sigma"].shape) * options.density_noise
    return out


def importance_render(planes, decoder_params, ray_origins, ray_directions,
                      options: RenderingOptions, rng=None,
                      packed: bool = False, sampler=None):
    """Full coarse+fine triplane render (reference renderer.py:88-142).

    planes (N, 3, C, H, W) — or a pack_planes_for_sampling table when
    packed=True; rays (N, R, 3). Returns the 6-tuple
    (rgb_coarse, depth_coarse, opacity_coarse, rgb_fine, depth_fine,
    opacity_fine) with opacities summed over samples."""
    if rng is not None:
        k_strat, k_pdf, k_noise1, k_noise2 = jax.random.split(rng, 4)
    else:
        k_strat = k_pdf = k_noise1 = k_noise2 = None

    if options.ray_start == "auto":
        ray_start, ray_end = get_ray_limits_box(ray_origins, ray_directions,
                                                options.box_warp)
        valid = (ray_end > ray_start)[..., 0]
        safe_min = jnp.min(jnp.where(valid, ray_start[..., 0], jnp.inf))
        safe_max = jnp.max(jnp.where(valid, ray_start[..., 0], -jnp.inf))
        ray_start = jnp.where(valid[..., None], ray_start, safe_min)
        ray_end = jnp.where(valid[..., None], ray_end, safe_max)
        depths_coarse = sample_stratified(ray_origins, ray_start, ray_end,
                                          options.depth_resolution,
                                          options.disparity_space_sampling, k_strat)
    else:
        depths_coarse = sample_stratified(ray_origins, options.ray_start,
                                          options.ray_end, options.depth_resolution,
                                          options.disparity_space_sampling, k_strat)

    n, r, s, _ = depths_coarse.shape
    coords = (ray_origins[:, :, None, :] +
              depths_coarse * ray_directions[:, :, None, :]).reshape(n, -1, 3)
    out = run_model(planes, decoder_params, coords, options, k_noise1,
                    packed=packed, sampler=sampler, n_samples=s)
    colors_coarse = out["rgb"].reshape(n, r, s, -1)
    densities_coarse = out["sigma"].reshape(n, r, s, 1)

    rgb_coarse, depth_coarse, weights_coarse = mip_ray_march(
        colors_coarse, densities_coarse, depths_coarse, options.white_back)

    n_imp = options.depth_resolution_importance
    depths_fine = sample_importance(depths_coarse, weights_coarse, n_imp, k_pdf)
    coords = (ray_origins[:, :, None, :] +
              depths_fine * ray_directions[:, :, None, :]).reshape(n, -1, 3)
    out = run_model(planes, decoder_params, coords, options, k_noise2,
                    packed=packed, sampler=sampler, n_samples=n_imp)
    colors_fine = out["rgb"].reshape(n, r, n_imp, -1)
    densities_fine = out["sigma"].reshape(n, r, n_imp, 1)

    all_depths, all_colors, all_densities = unify_samples(
        depths_coarse, colors_coarse, densities_coarse,
        depths_fine, colors_fine, densities_fine)
    rgb_fine, depth_fine, weights_fine = mip_ray_march(
        all_colors, all_densities, all_depths, options.white_back)

    return (rgb_coarse, depth_coarse, jnp.sum(weights_coarse, axis=2),
            rgb_fine, depth_fine, jnp.sum(weights_fine, axis=2))


# -- TriPlaneGenerator / EG3DRenderer (reference: triplane.py, eg3d_renderer.py)

@dataclasses.dataclass(frozen=True)
class TriPlaneConfig:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    plane_resolution: int = 256
    n_planes: int = 3
    plane_channels: int = 32
    mapping_layers: int = 2
    channel_base: int = 32768
    channel_max: int = 512
    c_gen_conditioning_zero: bool = False
    c_scale: float = 1.0
    rendering: RenderingOptions = RenderingOptions()

    @property
    def backbone(self) -> GeneratorConfig:
        return GeneratorConfig(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            img_resolution=self.plane_resolution,
            img_channels=self.n_planes * self.plane_channels,
            mapping_layers=self.mapping_layers,
            channel_base=self.channel_base, channel_max=self.channel_max,
            conv_clamp=None)


def init_triplane_generator(key, cfg: TriPlaneConfig = TriPlaneConfig()) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"backbone": init_generator(k1, cfg.backbone),
            "decoder": init_osg_decoder(k2, cfg.plane_channels)}


def triplane_mapping(params, cfg: TriPlaneConfig, z, c=None,
                     truncation_psi: float = 1.0):
    """(reference triplane.py:52-55)."""
    if c is not None and cfg.c_gen_conditioning_zero:
        c = jnp.zeros_like(c)
    if c is not None:
        c = c * cfg.c_scale
    return apply_mapping(params["backbone"]["mapping"], cfg.backbone.mapping,
                         z, c, truncation_psi=truncation_psi)


def triplane_mapping_pre_broadcast(params, cfg: TriPlaneConfig, z, c=None):
    """Mapping output before ws broadcast (N, w_dim) — for the w_avg EMA."""
    if c is not None and cfg.c_gen_conditioning_zero:
        c = jnp.zeros_like(c)
    if c is not None:
        c = c * cfg.c_scale
    return mapping_pre_broadcast(params["backbone"]["mapping"],
                                 cfg.backbone.mapping, z, c)


def triplane_planes(params, cfg: TriPlaneConfig, ws, noise_mode="const", rng=None):
    planes = apply_synthesis_network(params["backbone"]["synthesis"],
                                     cfg.backbone.synthesis, ws,
                                     noise_mode=noise_mode, rng=rng)
    n = planes.shape[0]
    return planes.reshape(n, cfg.n_planes, cfg.plane_channels,
                          planes.shape[-2], planes.shape[-1])


def triplane_synthesis(params, cfg: TriPlaneConfig, ws, ray_origins,
                       ray_directions, noise_mode="const", rng=None) -> Dict[str, jax.Array]:
    """(reference triplane.py:57-68 synthesis2)."""
    if rng is not None:
        k_noise, k_render = jax.random.split(rng)
    else:
        k_noise = k_render = None
    planes = triplane_planes(params, cfg, ws, noise_mode, k_noise)
    (rgb_c, d_c, w_c, rgb_f, d_f, w_f) = importance_render(
        planes, params["decoder"], ray_origins, ray_directions,
        cfg.rendering, k_render)
    return {"rgb_coarse": rgb_c, "depth_coarse": d_c, "opacity_coarse": w_c,
            "rgb_fine": rgb_f, "depth_fine": d_f, "opacity_fine": w_f}


def triplane_sample(params, cfg: TriPlaneConfig, coordinates, z, c=None,
                    truncation_psi: float = 1.0) -> Dict[str, jax.Array]:
    """sigma/rgb at arbitrary coordinates for mesh extraction
    (reference triplane.py:122-127)."""
    ws = triplane_mapping(params, cfg, z, c, truncation_psi)
    planes = triplane_planes(params, cfg, ws)
    return run_model(planes, params["decoder"], coordinates, cfg.rendering)


# The single-scene EG3D renderer: learnable z (reference eg3d_renderer.py:39)

def init_eg3d_renderer(key, cfg: TriPlaneConfig = TriPlaneConfig(),
                       seed: int = 0) -> Dict[str, Any]:
    params = init_triplane_generator(key, cfg)
    params["z"] = jnp.asarray(np.random.RandomState(seed).randn(1, cfg.z_dim),
                              jnp.float32)
    return params


def eg3d_render(params, cfg: TriPlaneConfig, ray_origins, ray_directions,
                noise_mode="const", rng=None) -> Dict[str, jax.Array]:
    """(reference eg3d_renderer.py:47-63): rays (R, 3) → dict of (R, ...)."""
    ws = triplane_mapping(params, cfg, params["z"])
    out = triplane_synthesis(params, cfg, ws, ray_origins[None],
                             ray_directions[None], noise_mode, rng)
    return {k: v[0] for k, v in out.items()}


def eg3d_sample(params, cfg: TriPlaneConfig, coordinates) -> Dict[str, jax.Array]:
    """sigma queries for mesh extraction (reference eg3d_renderer.py:65-67)."""
    return triplane_sample(params, cfg, coordinates[None], params["z"])
