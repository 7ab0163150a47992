"""Fused proxy-scoring + top-K sample selection as a Pallas TPU kernel.

One kernel covers the fast renderer's front half per ray tile:

  candidate positions → proxy embedding → 2-layer proxy MLP →
  per-ray iterative top-K extraction → selected depths (T, K)

Selection uses K rounds of (max, first-argmax-by-iota, mask) — branch-free
VPU ops; the returned depths are score-ordered (callers sort the K values).
Bit-exact against the bf16 jnp fast path (render/fast.py); the proxy weight
layout is rearranged by pack_proxy_params (sin-block/cos-block, as in
fused_mlp).

STATUS — experimental, NOT the default: measured ~28 ms per 40K rays on v5e
vs ~9 ms for the XLA formulation in render/fast.py. Root cause: every
narrow-lane intermediate (xyz: 3 lanes, embedding: 40) pads to 128 VMEM
lanes, forcing TILE_R=64 to fit the 16 MB scoped-VMEM budget → 625 grid
steps of tiny work, and the K-round selection serializes per step. Kept as
infrastructure + a worked negative result: on this workload XLA's fusion of
the same graph is the better schedule (same conclusion as fused_mlp.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_siren_tpu.ops.pallas.fused_mlp import _embed_perm


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))

TILE_R = 64
PROXY_FREQS = 5          # must match render.fast.PROXY_FREQS
EMB_LANES = 40           # 3 + 2*3*5 = 33 → padded


def pack_proxy_params(proxy: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    perm = _embed_perm(PROXY_FREQS)
    hidden = proxy["l1"]["kernel"].shape[1]
    return {
        "w1": _pad_rows(proxy["l1"]["kernel"][perm], EMB_LANES).astype(jnp.bfloat16),
        "b1": proxy["l1"]["bias"].reshape(1, -1).astype(jnp.float32),
        "w2": jnp.pad(proxy["l2"]["kernel"], ((0, 0), (0, 7))).astype(jnp.bfloat16),
        "b2": jnp.pad(proxy["l2"]["bias"], (0, 7)).reshape(1, -1).astype(jnp.float32),
    }


def _kernel(n_candidates, n_keep, xyz_ref, z_ref, w1, b1, w2, b2, zsel_ref):
    """xyz_ref: (TILE_R * S, 4) flat candidate positions (built outside —
    keeps every in-kernel intermediate 2-D, which is what Mosaic tiles well);
    z_ref: (TILE_R, S) candidate depths."""
    s = n_candidates
    x3 = xyz_ref[:, :3]                                         # (T*S, 3)
    n = x3.shape[0]
    t_r = n // s

    reps = jnp.concatenate([x3] * PROXY_FREQS, axis=1)          # (T*S, 15)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * PROXY_FREQS), 1) // 3
    scaled = reps * jnp.exp2(k.astype(jnp.float32))
    emb = jnp.concatenate(
        [x3, jnp.sin(scaled), jnp.cos(scaled),
         jnp.zeros((n, EMB_LANES - 3 - 6 * PROXY_FREQS), jnp.float32)], axis=1)

    h = jax.lax.dot_general(emb.astype(jnp.bfloat16), w1[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b1[...]
    h = jax.nn.relu(h)
    sc = jax.lax.dot_general(h.astype(jnp.bfloat16), w2[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + b2[...]
    scores = sc[:, 0].reshape(t_r, s)
    z = z_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (t_r, s), 1)
    for kk in range(n_keep):
        m = jnp.max(scores, axis=1, keepdims=True)
        is_max = scores == m
        idx = jnp.min(jnp.where(is_max, lane, s), axis=1, keepdims=True)
        sel = lane == idx
        zsel_ref[:, kk] = jnp.sum(jnp.where(sel, z, 0.0), axis=1)
        scores = jnp.where(sel, -jnp.inf, scores)


@functools.partial(jax.jit, static_argnames=("n_candidates", "n_keep"))
def proxy_select(packed: Dict[str, jnp.ndarray], rays: jax.Array,
                 n_candidates: int = 64, n_keep: int = 16) -> jax.Array:
    """rays (R, 8) → selected candidate depths (R, n_keep), score-ordered."""
    r = rays.shape[0]
    pad = -r % TILE_R
    rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
    rp = rays_p.shape[0]
    s = n_candidates

    near, far = rays_p[:, 6:7], rays_p[:, 7:8]
    t = jnp.linspace(0.0, 1.0, s)
    z = near * (1 - t) + far * t                                # (R', S)
    xyz = (rays_p[:, None, 0:3] + rays_p[:, None, 3:6] * z[..., None])
    xyz4 = jnp.concatenate(
        [xyz, jnp.zeros((rp, s, 1), xyz.dtype)], -1).reshape(rp * s, 4)

    names = ["w1", "b1", "w2", "b2"]
    out = pl.pallas_call(
        functools.partial(_kernel, n_candidates, n_keep),
        grid=(rp // TILE_R,),
        in_specs=[pl.BlockSpec((TILE_R * s, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE_R, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names],
        out_specs=pl.BlockSpec((TILE_R, n_keep), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n_keep), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xyz4, z, *[packed[n] for n in names])
    return out[:r]
