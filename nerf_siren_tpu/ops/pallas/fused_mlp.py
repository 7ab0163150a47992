"""Fused NeRF field evaluation as a Pallas TPU kernel.

The XLA path is HBM-bound: each of the 8 trunk layers round-trips a (N, 256)
f32 activation through HBM (~16 KB/point), capping throughput at ~70 M pts/s
on v5e. This kernel keeps ALL weights (~1.2 MB bf16) and one point-tile's
activations resident in VMEM, computes the positional embedding in-register,
and runs the whole trunk + heads per grid step — HBM traffic drops to the
xyz/dir inputs and an 8-float output per point, making the MLP compute-bound
on the MXU.

Numerics match the jnp path (`models.nerf.apply_nerf` with
compute_dtype=bfloat16): bf16 operands, f32 accumulation; asserted in tests.

Weight packing (pack_nerf_params):
- embedding is rearranged from the reference interleave
  [x, sin(f0 x), cos(f0 x), sin(f1 x), ...] (reference: models/nerf.py:33-38)
  to the kernel layout [x | sin(f0..f9) | cos(f0..f9) | 0pad] (64 lanes);
  first-layer weight ROWS are permuted to compensate → identical results.
- the skip layer's (emb ++ h) concat is split into two matmuls
  (64x256 + 256x256) so every contraction is a multiple of the 128-lane MXU.
- the direction branch is likewise split (256x128 + 32x128) with dir layout
  [d | sin | cos | 0pad] (32 lanes).

Inference-only for now: training keeps the jnp field (autodiff); this kernel
serves eval/bench and the test-time sigma-only pass.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_siren_tpu.config import NeRFConfig

TILE_N = 1024  # points per grid step


def _embed_perm(n_freqs: int, in_ch: int = 3) -> np.ndarray:
    """Row permutation: kernel embedding layout -> reference layout."""
    idx = list(range(in_ch))  # x passthrough
    for k in range(n_freqs):  # sin block
        idx.extend(in_ch + 2 * in_ch * k + c for c in range(in_ch))
    for k in range(n_freqs):  # cos block
        idx.extend(2 * in_ch + 2 * in_ch * k + c for c in range(in_ch))
    return np.asarray(idx)


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


def _bias(b: jnp.ndarray, lanes: int = 0) -> jnp.ndarray:
    if lanes:
        b = jnp.pad(b, (0, lanes - b.shape[0]))
    return b.reshape(1, -1).astype(jnp.float32)


def pack_nerf_params(params: Dict[str, Any], cfg: NeRFConfig = NeRFConfig(),
                     n_freqs_xyz: int = 10, n_freqs_dir: int = 4) -> Dict[str, jnp.ndarray]:
    """Convert standard NeRF params into the kernel's padded bf16 layout."""
    assert cfg.skips == (4,), "kernel supports the reference skip=(4,) topology"
    assert cfg.width % 128 == 0 and cfg.depth >= 2

    emb_x = 3 * (2 * n_freqs_xyz + 1)        # 63
    perm_x = _embed_perm(n_freqs_xyz)
    perm_d = _embed_perm(n_freqs_dir)
    bf = jnp.bfloat16

    out: Dict[str, jnp.ndarray] = {}
    layers = params["xyz_layers"]
    out["w0"] = _pad_rows(layers[0]["kernel"][perm_x], 64).astype(bf)
    out["b0"] = _bias(layers[0]["bias"])

    for i in range(1, cfg.depth):
        k = layers[i]["kernel"]
        if i in cfg.skips:  # reference concat order is [emb, h] (nerf.py:109)
            out[f"w{i}e"] = _pad_rows(k[:emb_x][perm_x], 64).astype(bf)
            out[f"w{i}h"] = k[emb_x:].astype(bf)
        else:
            out[f"w{i}"] = k.astype(bf)
        out[f"b{i}"] = _bias(layers[i]["bias"])

    out["w_sigma"] = jnp.pad(params["sigma"]["kernel"], ((0, 0), (0, 7))).astype(bf)
    out["b_sigma"] = _bias(params["sigma"]["bias"], 8)

    out["w_feat"] = params["xyz_final"]["kernel"].astype(bf)
    out["b_feat"] = _bias(params["xyz_final"]["bias"])

    wd = params["dir_layer"]["kernel"]  # (W+27, W//2)
    out["w_dir_f"] = wd[: cfg.width].astype(bf)
    out["w_dir_d"] = _pad_rows(wd[cfg.width:][perm_d], 32).astype(bf)
    out["b_dir"] = _bias(params["dir_layer"]["bias"])

    out["w_rgb"] = jnp.pad(params["rgb"]["kernel"], ((0, 0), (0, 5))).astype(bf)
    out["b_rgb"] = _bias(params["rgb"]["bias"], 8)
    return out


def _sigma_weight_names(depth, skips):
    names = ["w0", "b0"]
    for i in range(1, depth):
        names += ([f"w{i}e", f"w{i}h", f"b{i}"] if i in skips else [f"w{i}", f"b{i}"])
    return names + ["w_sigma", "b_sigma"]


def _full_weight_names(depth, skips):
    return _sigma_weight_names(depth, skips) + [
        "w_feat", "b_feat", "w_dir_f", "w_dir_d", "b_dir", "w_rgb", "b_rgb"]


def _embed_in_kernel(x3: jnp.ndarray, n_freqs: int, out_lanes: int) -> jnp.ndarray:
    """[x | sin blocks | cos blocks | pad] embedding, f32, (T, out_lanes)."""
    reps = jnp.concatenate([x3] * n_freqs, axis=1)                    # (T, 3F)
    # freqs = 2^(lane//3), built in-kernel (captured np constants are not
    # allowed in pallas kernels)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * n_freqs), 1) // 3
    scaled = reps * jnp.exp2(k.astype(jnp.float32))
    emb = jnp.concatenate([x3, jnp.sin(scaled), jnp.cos(scaled)], axis=1)
    pad = out_lanes - emb.shape[1]
    if pad:
        emb = jnp.concatenate([emb, jnp.zeros((emb.shape[0], pad), emb.dtype)], axis=1)
    return emb


def _dot(a, w):
    return jax.lax.dot_general(a.astype(jnp.bfloat16), w,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _trunk(refs, emb: jnp.ndarray, depth: int, skips) -> jnp.ndarray:
    h = jax.nn.relu(_dot(emb, refs["w0"][...]) + refs["b0"][...])
    for i in range(1, depth):
        if i in skips:
            h = jax.nn.relu(_dot(emb, refs[f"w{i}e"][...]) +
                            _dot(h, refs[f"w{i}h"][...]) + refs[f"b{i}"][...])
        else:
            h = jax.nn.relu(_dot(h, refs[f"w{i}"][...]) + refs[f"b{i}"][...])
    return h


def _sigma_kernel(depth, skips, n_freqs_xyz, xyz_ref, *args):
    *w_refs, out_ref = args
    refs = dict(zip(_sigma_weight_names(depth, skips), w_refs))
    emb = _embed_in_kernel(xyz_ref[:, :3], n_freqs_xyz, 64)
    h = _trunk(refs, emb, depth, skips)
    out_ref[:, :] = _dot(h, refs["w_sigma"][...]) + refs["b_sigma"][...]


def _full_kernel(depth, skips, n_freqs_xyz, n_freqs_dir, xyz_ref, dir_ref, *args):
    *w_refs, out_ref = args
    refs = dict(zip(_full_weight_names(depth, skips), w_refs))
    emb = _embed_in_kernel(xyz_ref[:, :3], n_freqs_xyz, 64)
    h = _trunk(refs, emb, depth, skips)

    sigma = _dot(h, refs["w_sigma"][...]) + refs["b_sigma"][...]       # (T, 8)
    feat = _dot(h, refs["w_feat"][...]) + refs["b_feat"][...]
    demb = _embed_in_kernel(dir_ref[:, :3], n_freqs_dir, 32)
    hd = jax.nn.relu(_dot(feat, refs["w_dir_f"][...]) +
                     _dot(demb, refs["w_dir_d"][...]) + refs["b_dir"][...])
    rgb = jax.nn.sigmoid(_dot(hd, refs["w_rgb"][...]) + refs["b_rgb"][...])  # (T, 8)
    # output lanes: [r, g, b, sigma, 0, 0, 0, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 1)
    out_ref[:, :] = jnp.where(lane < 3, rgb, jnp.where(lane == 3, sigma[:, :1], 0.0))


def _run(kernel_fn, names, packed, point_inputs, n):
    n_padded = point_inputs[0].shape[0]
    grid = (n_padded // TILE_N,)
    point_specs = [pl.BlockSpec((TILE_N, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)
                   for _ in point_inputs]
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names]
    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=point_specs + weight_specs,
        out_specs=pl.BlockSpec((TILE_N, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, 8), jnp.float32),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(*point_inputs, *[packed[k] for k in names])
    return out[:n]


@functools.partial(jax.jit, static_argnames=("depth", "skips", "n_freqs_xyz"))
def fused_nerf_sigma(packed: Dict[str, jnp.ndarray], xyz: jnp.ndarray,
                     depth: int = 8, skips=(4,), n_freqs_xyz: int = 10) -> jnp.ndarray:
    """sigma for (N, 3) points; returns (N, 1) f32."""
    n = xyz.shape[0]
    xyz4 = jnp.pad(xyz, ((0, -n % TILE_N), (0, 1)))
    kernel = functools.partial(_sigma_kernel, depth, skips, n_freqs_xyz)
    out = _run(kernel, _sigma_weight_names(depth, skips), packed, [xyz4], n)
    return out[:, :1]


@functools.partial(jax.jit, static_argnames=("depth", "skips", "n_freqs_xyz", "n_freqs_dir"))
def fused_nerf_full(packed: Dict[str, jnp.ndarray], xyz: jnp.ndarray, dirs: jnp.ndarray,
                    depth: int = 8, skips=(4,), n_freqs_xyz: int = 10,
                    n_freqs_dir: int = 4) -> jnp.ndarray:
    """[rgb, sigma] for (N, 3) points with per-point (N, 3) directions → (N, 4)."""
    n = xyz.shape[0]
    xyz4 = jnp.pad(xyz, ((0, -n % TILE_N), (0, 1)))
    dir4 = jnp.pad(dirs, ((0, -n % TILE_N), (0, 1)))
    kernel = functools.partial(_full_kernel, depth, skips, n_freqs_xyz, n_freqs_dir)
    out = _run(kernel, _full_weight_names(depth, skips), packed, [xyz4, dir4], n)
    return out[:, :4]


def pack_model_params(params: Dict[str, Any], cfg: NeRFConfig = NeRFConfig(),
                      n_freqs_xyz: int = 10, n_freqs_dir: int = 4):
    """Pack each model in a {'coarse': ..., 'fine': ...} dict."""
    return {k: pack_nerf_params(v, cfg, n_freqs_xyz, n_freqs_dir)
            for k, v in params.items()}


def make_fused_field_fn(rays_d: jnp.ndarray, cfg: NeRFConfig = NeRFConfig()):
    """A render_rays `field_fn` backed by the fused kernels.

    Use with packed params: render_rays(pack_model_params(params), rays, ...,
    field_fn=make_fused_field_fn(rays[:, 3:6], nerf_cfg)). The direction
    branch consumes RAW per-ray directions (broadcast per sample), ignoring
    the dir_emb argument render_rays supplies.
    """
    def field_fn(packed, xyz, dir_emb):
        r, s, _ = xyz.shape
        flat = xyz.reshape(r * s, 3)
        if dir_emb is None:
            out = fused_nerf_sigma(packed, flat, depth=cfg.depth, skips=cfg.skips)
            return out.reshape(r, s, 1)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (r, s, 3)).reshape(r * s, 3)
        out = fused_nerf_full(packed, flat, dirs, depth=cfg.depth, skips=cfg.skips)
        return out.reshape(r, s, 4)
    return field_fn
