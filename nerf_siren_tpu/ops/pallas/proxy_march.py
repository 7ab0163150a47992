"""Fused proxy march + inverse-CDF sample selection (Pallas TPU kernel).

Collapses the fast renderer's entire pre-model pipeline (render/fast.py
steps 2-4: candidate march, proxy MLP scoring, expected compositing weights,
deterministic inverse-CDF placement) into one VMEM-resident kernel and emits
the survivor coordinates directly in the transposed lane-major layout the
fused field kernel (ops/pallas/fused_mlp.py) consumes.

Why it exists: at C=32 candidates the jnp pipeline costs ~55 ms of a 640K-ray
frame and none of it is FLOPs (the proxy MLP is ~250x smaller than the NeRF
field). The point-major proxy eval is layout-bound (narrow (R,S,33) tiles),
the (R,C) expected-weight tensor round-trips HBM, sample_pdf materializes an
(R,K,C) comparison tensor, and the survivor-coordinate broadcast
(8,R,K)->(8,R*K) is a narrow relayout. In-kernel all of it is sublane math
over (C,T)/(128,T) tiles that never leaves VMEM; the only HBM traffic is
(8,T) rays in and (K,T) depths + two (8,K*T) coordinate blocks out.

Semantics match render_rays_fast(select='pdf'), i.e. the reference's
deterministic hierarchical sample_pdf (reference: models/rendering.py:22-67)
with the proxy standing in for the coarse pass: uniform candidates in
[near, far], expected weight = alpha x transmittance under the proxy density
sigma_hat = expm1(relu(score)), z-midpoint bins over the INTERIOR weights
w[1:-1], eps-floored pdf, zero-padded CDF, u = linspace(0,1,K), clamped
below/above bins, denom<eps -> 1. Equality with the jnp path is asserted in
tests/test_proxy_march.py (small bf16 matmul-order deltas move the CDF, but
the inverse-CDF interpolation is continuous, so depths differ by O(eps)).

The three per-k index lookups need no gathers: candidate depths are an
analytic function of the index (z_i = near + i*spacing), so `bins_below` is
computed directly from the masked COUNT, and the cdf value lookups become
masked min/max sublane reductions (the same trick ops/sample_pdf.py uses,
but over VMEM rows instead of an (R,K,C) HBM tensor).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_siren_tpu.ops.pallas.fused_mlp import (
    IN_ROWS, OUT_ROWS, _dot, _dot_f32, _embed_matrices_t, _split_embed_cols)

PROXY_FREQS = 5     # must match render/fast.py
EMB_ROWS = 32       # 15 sin + 15 cos + 2 pad
HID_ROWS = 128      # proxy hidden cap (pack pads to 64 when hidden <= 64)
TILE_R = 2048       # rays (lanes) per grid step


def pack_proxy_params(proxy: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Convert an init_proxy/distill_proxy pytree into the kernel layout.

    The l1 embedding columns are split like the field kernel's: passthrough
    coordinate columns act on the ray ORIGIN rows (0-2) and, scaled by z, on
    the DIRECTION rows (3-5) — xyz = o + d*z never materializes, the kernel
    evaluates W1x @ xyz as (W1x@o) + (W1x@d)*z with both matmuls hoisted out
    of the candidate loop. Same for the frequency matrix S.
    """
    l1k = np.asarray(proxy["l1"]["kernel"], np.float32).T       # (H, 33)
    hid = l1k.shape[0]
    assert hid <= HID_ROWS, f"proxy hidden {hid} exceeds kernel cap {HID_ROWS}"
    # pad the hidden dim to the smallest sublane block that fits: the
    # (HID, T) relu/astype epilogue is the kernel's dominant VPU cost after
    # the recurrence, so a 48-wide proxy should pay for 64 rows, not 128
    hid_rows = 64 if hid <= 64 else HID_ROWS
    w1x, w1s = _split_embed_cols(l1k, PROXY_FREQS)              # (H,8),(H,32)
    w1x = np.pad(w1x, ((0, hid_rows - hid), (0, 0)))
    w1s = np.pad(w1s, ((0, hid_rows - hid), (0, 0)))
    b1 = np.zeros((hid_rows, 1), np.float32)
    b1[:hid, 0] = np.asarray(proxy["l1"]["bias"], np.float32)
    w2 = np.zeros((8, hid_rows), np.float32)
    w2[0, :hid] = np.asarray(proxy["l2"]["kernel"], np.float32)[:, 0]
    b2 = np.zeros((8, 1), np.float32)
    b2[0, 0] = np.asarray(proxy["l2"]["bias"], np.float32)[0]

    S, P = _embed_matrices_t(PROXY_FREQS, EMB_ROWS)             # (32,8),(32,1)
    s_d = np.zeros_like(S)
    s_d[:, 3:6] = S[:, 0:3]          # direction rows live at 3-5 of raysT
    w1x_d = np.zeros_like(w1x)
    w1x_d[:, 3:6] = w1x[:, 0:3]
    bf = jnp.bfloat16
    return {"s_o": jnp.asarray(S), "s_d": jnp.asarray(s_d),
            "p": jnp.asarray(P),
            "w1x_o": jnp.asarray(w1x, bf), "w1x_d": jnp.asarray(w1x_d, bf),
            "w1s": jnp.asarray(w1s, bf), "b1": jnp.asarray(b1),
            "w2": jnp.asarray(w2, bf), "b2": jnp.asarray(b2)}


_WEIGHT_NAMES = ("s_o", "s_d", "p", "w1x_o", "w1x_d", "w1s", "b1", "w2", "b2")


def _march_weights(C, x, s_o, s_d, p, w1x_o, w1x_d, w1s, b1, w2, b2):
    """The candidate march under the proxy, shared by both kernels.

    x: (8, T) f32 rays. Returns (w_rows, tr): C expected-compositing-weight
    rows (1, T) and the final transmittance (1, T).

    Two measured on-chip optimizations (docs/status.md; the ablation
    profile put the naive march at 45 ns/ray, 58% of it in sin, while
    the matmuls fully overlap — lane-grouping them was a measured wash):

    1. ROTATION RECURRENCE for the embedding. The candidates are
       uniformly spaced in z, and the emb rows are [sin th | cos th | 0]
       of the same 15 phases th = A + B*z (fused_mlp._embed_matrices_t
       layout), so th advances by the per-ray constant delta = B*spacing
       each step: one sin for candidate 0 plus cos/sin of delta replace
       C*32 sin evaluations with 6 mul/adds per phase per step. f32
       drift over C=32 rotation steps is ~1e-6 — far below the bf16
       matmul noise.
    2. FOLDED EPILOGUE: pre = [W1s|W1x_o|W1x_d|b1] @ [emb; x; x*z; 1]
       — the coordinate terms and bias ride the (overlapped) MXU instead
       of three (HID, T) VPU adds per step."""
    bf = jnp.bfloat16
    tile = x.shape[1]
    n = 3 * PROXY_FREQS
    d = x[3:6]
    near, far = x[6:7], x[7:8]                        # (1, T)
    dirn = jnp.sqrt(d[0:1] ** 2 + d[1:2] ** 2 + d[2:3] ** 2)
    spacing = (far - near) / (C - 1)
    dz = spacing * dirn

    xb = x.astype(bf)
    # emb_j = sin(A + B*z_j) with A = S@o + P, B = S_d@d
    a_op = _dot_f32(s_o[...], x) + p[...]             # (32, T) f32
    b_op = _dot_f32(s_d[...], x)                      # (32, T) f32
    emb0 = jnp.sin(a_op + b_op * near)
    sn, cs = emb0[0:n], emb0[n:2 * n]                 # (15, T) each
    delta = b_op[0:n] * spacing
    cd, sd = jnp.cos(delta), jnp.sin(delta)
    zero_pad = jnp.zeros((EMB_ROWS - 2 * n, tile), jnp.float32)
    ones = jnp.ones((1, tile), bf)
    wstack = jnp.concatenate(
        [w1s[...], w1x_o[...], w1x_d[...], b1[...].astype(bf)],
        axis=1)                                       # (HID, 49) bf16

    tr = jnp.ones_like(near)
    w_rows = []
    zj = near
    for j in range(C):
        emb = jnp.concatenate([sn, cs, zero_pad], axis=0).astype(bf)
        stacked = jnp.concatenate(
            [emb, xb, (x * zj).astype(bf), ones], axis=0)   # (49, T)
        pre = _dot(wstack, stacked)                   # (HID, T) f32
        h = jax.nn.relu(pre).astype(bf)
        score = (_dot(w2[...], h) + b2[...])[0:1]     # (1, T) f32
        # exp(x)-1, not expm1: Mosaic has no expm1 lowering (KernelType.TC);
        # score >= 0 here so the subtraction loses nothing material
        sig = jnp.exp(jax.nn.relu(score)) - 1.0
        a = 1.0 - jnp.exp(-sig * dz)
        w_rows.append(a * tr)
        tr = tr * (1.0 - a + 1e-10)
        sn, cs = sn * cd + cs * sd, cs * cd - sn * sd
        zj = zj + spacing
    return w_rows, tr


def _opacity_kernel(C, x_ref, s_o, s_d, p, w1x_o, w1x_d, w1s, b1, w2, b2,
                    out_ref):
    """Per-ray proxy opacity only — the cheap culling prepass: C proxy evals
    per ray, one (8, T) store, none of the selection / coordinate work."""
    x = x_ref[...]                                    # (8, T) f32
    _, tr = _march_weights(C, x, s_o, s_d, p, w1x_o, w1x_d, w1s, b1, w2, b2)
    opac = 1.0 - tr                                   # (1, T)
    row = jax.lax.broadcasted_iota(jnp.int32, (out_ref.shape[0], x.shape[1]), 0)
    out_ref[...] = jnp.where(row == 0, opac, 0.0)


def _march_kernel(C, K, midpoint, density, x_ref, s_o, s_d, p, w1x_o, w1x_d,
                  w1s, b1, w2, b2, z_ref, xyz_ref, dir_ref, *maybe_aux):
    x = x_ref[...]                                    # (8, T) f32
    tile = x.shape[1]
    o = x[0:3]
    d = x[3:6]
    near, far = x[6:7], x[7:8]                        # (1, T)
    spacing = (far - near) / (C - 1)

    w_rows, _ = _march_weights(C, x, s_o, s_d, p, w1x_o, w1x_d, w1s, b1, w2, b2)

    # deterministic inverse-CDF over the interior weights / midpoint bins
    # unrolled running sum (Mosaic has no cumsum lowering); the interior
    # rows are already materialized, so this is C-3 adds on (1, T) rows.
    # cdf = cumsum(ws)/sum(ws) == cumsum(ws / sum(ws))
    acc = w_rows[1] + 1e-5
    cum_rows = [acc]
    for wr in w_rows[2:C - 1]:
        acc = acc + (wr + 1e-5)
        cum_rows.append(acc)
    cdf = jnp.concatenate(cum_rows, axis=0) / acc            # (C-2, T)
    last = cdf[-1:, :]
    # bins b_i = near + (i+0.5)*spacing for i in [0, C-2]; cdf entry c_0 = 0
    z_rows, xyz_blocks, rho_rows = [], [], []
    for k in range(K):
        # midpoint: strata-centered quantiles u=(k+.5)/K — no sample burnt
        # at CDF 0/1 (better quadrature at small K); edges: reference
        # sample_pdf det semantics u=k/(K-1) (models/rendering.py:43-48)
        if midpoint:
            u = (k + 0.5) / K
        else:
            u = k / (K - 1) if K > 1 else 0.0
        mask = cdf <= u
        cnt = 1.0 + jnp.sum(mask.astype(jnp.float32), axis=0)  # incl. c_0
        below = cnt - 1.0                                      # in [0, C-2]
        above = jnp.minimum(cnt, float(C - 2))
        cdf_below = jnp.max(jnp.where(mask, cdf, 0.0), axis=0, keepdims=True)
        cdf_above = jnp.min(jnp.where(mask, 2.0, cdf), axis=0, keepdims=True)
        cdf_above = jnp.where(cdf_above > 1.5, last, cdf_above)
        bins_below = near + (below[None, :] + 0.5) * spacing
        bins_above = near + (above[None, :] + 0.5) * spacing
        denom = cdf_above - cdf_below
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        zk = bins_below + (u - cdf_below) / denom * (bins_above - bins_below)
        z_rows.append(zk)
        xyz_blocks.append(o + d * zk)                          # (3, T)
        if density:
            # NORMALIZED pdf density of the landing bin per unit z (raw
            # Δcdf, not the denom<eps→1 replacement): the ratio-quadrature
            # epilogue (render/fast.py) scales it by the unnormalized mass
            rho_rows.append((cdf_above - cdf_below)
                            / jnp.maximum(bins_above - bins_below, 1e-7))

    if density:
        # aux rows 0..K-1 = per-sample bin density, row K = the placement
        # CDF's unnormalized interior mass W (incl. its 1e-5 floors)
        maybe_aux[0][...] = jnp.concatenate(rho_rows + [acc], axis=0)
    z_ref[...] = jnp.concatenate(z_rows, axis=0)               # (K, T)
    zero5 = jnp.zeros((IN_ROWS - 3, tile), jnp.float32)
    d8 = jnp.concatenate([d, zero5], axis=0)
    for k in range(K):
        xyz_ref[:, k * tile:(k + 1) * tile] = jnp.concatenate(
            [xyz_blocks[k], zero5], axis=0)
        dir_ref[:, k * tile:(k + 1) * tile] = d8


@functools.partial(jax.jit, static_argnames=("n_candidates",))
def proxy_opacity(
    packed_proxy: Dict[str, jnp.ndarray],
    raysT: jnp.ndarray,
    n_candidates: int,
) -> jnp.ndarray:
    """Per-ray proxy opacity (1 - final transmittance) over the candidate
    march — the culling prepass. raysT: (8, R) f32, R a multiple of TILE_R.
    Returns (R,) f32 in [0, 1]."""
    C = n_candidates
    assert C >= 4
    r = raysT.shape[1]
    assert r % TILE_R == 0, f"pad rays to a multiple of {TILE_R} (got {r})"
    kernel = functools.partial(_opacity_kernel, C)
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _WEIGHT_NAMES]
    out = pl.pallas_call(
        kernel,
        grid=(r // TILE_R,),
        in_specs=[pl.BlockSpec((IN_ROWS, TILE_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((IN_ROWS, TILE_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((IN_ROWS, r), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(raysT, *[packed_proxy[k] for k in _WEIGHT_NAMES])
    return out[0]


@functools.partial(jax.jit,
                   static_argnames=("n_candidates", "n_keep", "midpoint",
                                    "return_density"))
def proxy_march_select(
    packed_proxy: Dict[str, jnp.ndarray],
    raysT: jnp.ndarray,
    n_candidates: int,
    n_keep: int,
    midpoint: bool = False,
    return_density: bool = False,
):
    """March C uniform candidates per ray, select K depths by proxy-guided
    deterministic inverse-CDF, and return the survivors transposed.

    raysT: (8, R) f32 rows [ox,oy,oz,dx,dy,dz,near,far]; R a multiple of
    TILE_R (pad rays with zeros — zero rays produce finite garbage that the
    caller slices off).

    Returns (z_sel, xyzT, dirT): (K, R) f32 ascending depths, and
    (8, K*R) f32 survivor coordinates/directions in CANDIDATE-MAJOR order
    (point p = k*R + r), ready for fused_full_t. K*TILE_R must be a
    multiple of the field kernel's TILE_N for a pad-free handoff.

    With return_density=True, a fourth array aux (K+1, R) is appended:
    rows 0..K-1 the NORMALIZED placement-CDF density of the bin each
    sample landed in (Δcdf/Δz, matching ops/sample_pdf.py's
    return_density), row K the CDF's unnormalized interior mass W — the
    two ingredients of the ratio quadrature (render/fast.py).
    """
    C, K = n_candidates, n_keep
    assert C >= 4 and K >= 2
    r = raysT.shape[1]
    assert r % TILE_R == 0, f"pad rays to a multiple of {TILE_R} (got {r})"
    grid = (r // TILE_R,)
    kernel = functools.partial(_march_kernel, C, K, midpoint, return_density)
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _WEIGHT_NAMES]
    out_specs = [
        pl.BlockSpec((K, TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((IN_ROWS, K * TILE_R), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((IN_ROWS, K * TILE_R), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((K, r), jnp.float32),
        jax.ShapeDtypeStruct((IN_ROWS, K * r), jnp.float32),
        jax.ShapeDtypeStruct((IN_ROWS, K * r), jnp.float32),
    ]
    if return_density:
        out_specs.append(pl.BlockSpec((K + 1, TILE_R), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((K + 1, r), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((IN_ROWS, TILE_R), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(raysT, *[packed_proxy[k] for k in _WEIGHT_NAMES])
    return tuple(out)
