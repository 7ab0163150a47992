"""int8 variant of the fused NeRF field kernel (trunk on the int8 MXU path).

Why: BASELINE.md's FLOP-arithmetic section shows dense (~40%+-foreground)
frames are compute-bound past ~4.7M rays/s @ 32 dB for any renderer that
evaluates the full 8x256 field per survivor in bf16 — the MXU's int8 mode
is the only remaining lever. Measured in-kernel on the v5e: the r3
STATIC-scale chain ran 2.39x the bf16 chain (raw int8 2.78x); this
DYNAMIC-scale chain runs 1.09x (tools/int8_kernel_bench.py, r4) — the
per-layer cross-sublane max reduce + rank-1 epilogue eats most of the
matmul win, but static scales were measured unusable on trained scenes
(see below), so 1.09x in-kernel / +5-12% end-to-end at zero quality cost
is the honest operating point. Next lever if more is needed: a coarser
or folded dynamic reduce (e.g. strided row subsample, or reusing the
previous layer's bound).

What is quantized (tools/int8_quality.py measures the rendered-quality cost
of each candidate recipe on a trained scene; docs/int8_quality.json):
  - the 8x256 xyz trunk's matmuls: weights int8 per-output-row (static, at
    pack time), activations int8 with DYNAMIC PER-POINT scales — each
    activation column's absmax, computed in-kernel (a (C,T) -> (1,T) max
    reduce, ~0.4% of the matmul FLOPs).
  - the positional-encoding sin/cos operand has range [-1, 1] by
    construction — fixed scale 1/127, folded into the weight row scales at
    pack time;
  - raw coordinates ride the same dynamic per-point scale path.
Everything else — the sin arguments themselves (f32: 2^9-scaled coordinates
cannot survive int8), sigma/rgb/direction heads (<10% of FLOPs), biases,
final trunk activation — stays f32/bf16, identical to fused_mlp.py.

Why dynamic, not calibrated-static (round-4 redesign, measured): a trained
trunk's late activations are extremely channel- and point-skewed (spheres
scene h7 absmax 1684, p99.9 870). Rendered agreement vs the exact frame,
fake-quant on the trained spheres scene (tools/int8_quality.py protocol):
per-tensor static absmax 16.7 dB (unusable), 99.9th-percentile 19.4 dB,
per-channel static 31.2 dB, per-point dynamic 51.2 dB — within 3 dB of
weight-only quantization (53.8 dB), i.e. the activation cost is ~zero.
Dynamic also removes calibration entirely: packing needs no scene points,
no AABB, and cannot be invalidated by out-of-calibration inputs (the
round-3 ADVICE finding about empty-space saturation).

The epilogue per matmul is (O,T)*(O,1)row_scale*(1,T)col_scale — one more
rank-1 broadcast than the 2.39x microbenchmark's epilogue paid for.

Layout, tiling, two-half pipelining, head math: identical to fused_mlp.py
(v3 transposed). Reference being replaced: the per-chunk MLP hot loop,
/root/reference/models/rendering.py:140-190. Inference-only, and NOT a
parity surface: the parity/training paths keep f32/bf16; this kernel serves
the fast proxy-culled renderer where quality is measured as agreement dB
(tools/fast_frontier.py --int8).
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
from nerf_siren_tpu.ops.pallas import fused_mlp
from nerf_siren_tpu.ops.pallas.fused_mlp import (
    IN_ROWS,
    OUT_ROWS,
    SIGMA_ROW,
    _dot,
    _dot_f32,
    _split_embed_cols,
    pack_nerf_params,
)

EMB_X = 63  # 3 * (2*10 + 1) reference embedding channels


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _quant_rows(w_t: np.ndarray):
    """Per-output-row symmetric int8 for a transposed (O, I) weight.
    Returns (int8 (O, I), f32 row scales (O, 1))."""
    s = np.max(np.abs(w_t), axis=1, keepdims=True) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(w_t / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def pack_nerf_params_int8(params: Dict[str, Any],
                          cfg: NeRFConfig = NeRFConfig(),
                          n_freqs_xyz: int = 10,
                          n_freqs_dir: int = 4) -> Dict[str, jnp.ndarray]:
    """Kernel layout for the int8 trunk + bf16 heads.

    No calibration inputs: activation scales are computed per point inside
    the kernel. The sin/cos operand's fixed 1/127 scale is folded into the
    f{i}s row-scale columns here. Head keys are reused verbatim from the
    bf16 pack.
    """
    assert cfg.skips == (4,), "kernel supports the reference skip=(4,) topology"
    assert n_freqs_xyz == 10 and n_freqs_dir == 4, "row layout is fixed"
    base = pack_nerf_params(params, cfg, n_freqs_xyz, n_freqs_dir)
    out: Dict[str, jnp.ndarray] = {k: base[k] for k in (
        "sx", "px", "sd", "pd", "w_sigma", "b_sigma",
        "w_comb", "b_comb", "wdx", "wds", "w_rgb", "b_rgb")}

    s_e = 1.0 / 127.0  # sin/cos range is exactly ±1: static, folded here
    layers = params["xyz_layers"]

    def f32t(x):
        return np.asarray(x, np.float32).T  # (O, I)

    for i in range(cfg.depth):
        k_t = f32t(layers[i]["kernel"])
        if i == 0 or i in cfg.skips:
            w_x, w_s = _split_embed_cols(k_t[:, :EMB_X], n_freqs_xyz)
            qx, sx_row = _quant_rows(w_x)
            qs, ss_row = _quant_rows(w_s)
            out[f"q{i}x"] = jnp.asarray(qx)
            out[f"f{i}x"] = jnp.asarray(sx_row)
            out[f"q{i}s"] = jnp.asarray(qs)
            out[f"f{i}s"] = jnp.asarray(ss_row * s_e)
            if i in cfg.skips:
                qh, sh_row = _quant_rows(k_t[:, EMB_X:])
                out[f"q{i}h"] = jnp.asarray(qh)
                out[f"f{i}h"] = jnp.asarray(sh_row)
        else:
            qh, sh_row = _quant_rows(k_t)
            out[f"q{i}"] = jnp.asarray(qh)
            out[f"f{i}"] = jnp.asarray(sh_row)
        out[f"b{i}"] = base[f"b{i}"]
    return out


def _int8_names(depth, skips):
    names = ["sx", "px", "q0x", "f0x", "q0s", "f0s", "b0"]
    for i in range(1, depth):
        if i in skips:
            names += [f"q{i}x", f"f{i}x", f"q{i}s", f"f{i}s",
                      f"q{i}h", f"f{i}h", f"b{i}"]
        else:
            names += [f"q{i}", f"f{i}", f"b{i}"]
    return names + ["w_sigma", "b_sigma",
                    "sd", "pd", "w_comb", "b_comb", "wdx", "wds",
                    "w_rgb", "b_rgb"]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _dot_i8(w, a):
    """(O, I) int8 @ (I, T) int8 -> (O, T) int32 on the MXU."""
    return jax.lax.dot_general(w, a, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


# The r4 lever (docstring top): the per-layer (256, T) -> (1, T) absmax
# reduce is most of the dynamic chain's overhead. DYN_STRIDE > 1 samples
# every DYN_STRIDE-th activation row for the absmax (a (256/s, T) reduce)
# and scales by DYN_SAFETY; rows whose true magnitude exceeds the sampled
# bound saturate at ±127.
#
# MEASURED NEGATIVE (round 5, docs/int8_stride.json, trained cluster
# field, on-chip): the strided reduce does not even speed the kernel —
# stride 2/4/8 run 0.92/1.02/1.07x the bf16 chain vs the FULL reduce's
# 1.10x (the reshape-slice costs what the saved reduction rows save;
# Mosaic's cross-sublane max was not the bottleneck) — while rendered
# agreement collapses (45.2 dB full -> 36.8 @ s2, 27.0 @ s4, 18.6 @ s8;
# safety 1.25 does not rescue it: trained trunks have heavy-tailed
# per-channel outliers, exactly why static scales failed in r4). The
# named r4 lever is dead; 1.09-1.10x in-kernel at zero quality cost is
# the honest dynamic-int8 operating point. Knobs kept for reproduction.
DYN_STRIDE = 1
DYN_SAFETY = 1.0


def _quant_dyn(v, stride=1, safety=1.0):
    """Dynamic per-point (per-column) int8: returns (int8 (C, T), f32
    col scales (1, T)). Zero columns quantize to 0 at the guard scale."""
    sub = v
    if stride > 1:
        c, t = v.shape
        sub = v.reshape(c // stride, stride, t)[:, 0, :]
    s = jnp.maximum(jnp.max(jnp.abs(sub), axis=0, keepdims=True),
                    1e-9) * (safety / 127.0)
    q = jnp.clip(jnp.round(v / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _requant_fixed(v, scale):
    """f32 -> int8 at a FIXED scale (the ±1-range sin/cos operand)."""
    return jnp.clip(jnp.round(v * scale), -127.0, 127.0).astype(jnp.int8)


def _trunk_int8(refs, x_ref, depth, skips, parts=2):
    """int8 trunk over `parts` skewed lane-slices; returns (hs, _) with hs
    the final bf16 activations (W, T/P) — head-compatible with fused_mlp."""
    tile = x_ref.shape[1]
    q = tile // parts

    def emb_q(x):
        e = jnp.sin(_dot_f32(refs["sx"][...], x) + refs["px"][...])
        return _requant_fixed(e, 127.0)  # 1/127 scale folded into f{i}s

    def stage0(xq, sx, eq):
        return (_dot_i8(refs["q0x"][...], xq).astype(jnp.float32)
                * refs["f0x"][...] * sx
                + _dot_i8(refs["q0s"][...], eq).astype(jnp.float32)
                * refs["f0s"][...])

    def stage(i, hq, sh, xq, sx, eq):
        y = _dot_i8(refs[f"q{i}h" if i in skips else f"q{i}"][...],
                    hq).astype(jnp.float32) \
            * refs[f"f{i}h" if i in skips else f"f{i}"][...] * sh
        if i in skips:
            y = (y + _dot_i8(refs[f"q{i}x"][...], xq).astype(jnp.float32)
                 * refs[f"f{i}x"][...] * sx
                 + _dot_i8(refs[f"q{i}s"][...], eq).astype(jnp.float32)
                 * refs[f"f{i}s"][...])
        return y

    xqs, sxs, eqs, ys = [], [], [], []
    for p in range(parts):
        x = x_ref[:, p * q:(p + 1) * q]
        # x rows beyond 3 are zero; the per-point dynamic scale covers the
        # live coordinate rows exactly (no scene-box calibration)
        xq, sx = _quant_dyn(x)
        eq = emb_q(x)
        xqs.append(xq)
        sxs.append(sx)
        eqs.append(eq)
        ys.append(stage0(xq, sx, eq))
    hs = [None] * parts
    # wavefront: at wave w, part p computes layer (w - p); the epilogue is
    # bias+relu+dynamic-requant instead of fused_mlp's bias+relu+bf16-cast
    for wave in range(1, depth + parts):
        for p in range(parts):
            layer = wave - p
            if 1 <= layer <= depth - 1:
                h_f = jax.nn.relu(ys[p] + refs[f"b{layer-1}"][...])
                hq, sh = _quant_dyn(h_f, DYN_STRIDE, DYN_SAFETY)
                hs[p] = hq
                ys[p] = stage(layer, hq, sh, xqs[p], sxs[p], eqs[p])
    out = []
    for p in range(parts):
        out.append(jax.nn.relu(ys[p] + refs[f"b{depth-1}"][...])
                   .astype(jnp.bfloat16))
    return out, xqs


def _full_kernel_int8(depth, skips, x_ref, d_ref, *args):
    """Full pass: int8 trunk + bf16 heads (head math identical to
    fused_mlp._full_kernel)."""
    *w_refs, out_ref = args
    refs = dict(zip(_int8_names(depth, skips), w_refs))
    bf = jnp.bfloat16

    hs, _ = _trunk_int8(refs, x_ref, depth, skips)
    q = x_ref.shape[1] // len(hs)

    def heads(h, d):
        sig = _dot(refs["w_sigma"][...], h) + refs["b_sigma"][...]
        demb = jnp.sin(_dot_f32(refs["sd"][...], d) + refs["pd"][...]).astype(bf)
        hd = jax.nn.relu(_dot(refs["w_comb"][...], h)
                         + _dot(refs["wdx"][...], d)
                         + _dot(refs["wds"][...], demb)
                         + refs["b_comb"][...]).astype(bf)
        rgb = jax.nn.sigmoid(_dot(refs["w_rgb"][...], hd) + refs["b_rgb"][...])
        row = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 0)
        res = jnp.where(row < 3, rgb, jnp.where(row == SIGMA_ROW, sig, 0.0))
        return res[:OUT_ROWS, :]

    for p, h in enumerate(hs):
        out_ref[:, p * q:(p + 1) * q] = heads(h, d_ref[:, p * q:(p + 1) * q])


def _sigma_kernel_int8(depth, skips, x_ref, *args):
    *w_refs, out_ref = args
    refs = dict(zip(_int8_names(depth, skips), w_refs))
    hs, _ = _trunk_int8(refs, x_ref, depth, skips)
    q = x_ref.shape[1] // len(hs)
    for p, h in enumerate(hs):
        out_ref[:, p * q:(p + 1) * q] = (
            _dot(refs["w_sigma"][...], h) + refs["b_sigma"][...])[:OUT_ROWS, :]


def _run_t(kernel_fn, names, packed, point_inputs):
    n_padded = point_inputs[0].shape[1]
    tile = min(fused_mlp.TILE_N, n_padded)  # module attr: tests patch it
    grid = (n_padded // tile,)
    point_specs = [pl.BlockSpec((IN_ROWS, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
                   for _ in point_inputs]
    weight_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in names]
    return pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=point_specs + weight_specs,
        out_specs=pl.BlockSpec((OUT_ROWS, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, n_padded), jnp.float32),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(*point_inputs, *[packed[k] for k in names])


def fused_full_t_int8(packed: Dict[str, jnp.ndarray], xyzT: jnp.ndarray,
                      dirT: jnp.ndarray, depth: int = 8,
                      skips=(4,)) -> jnp.ndarray:
    """Drop-in for fused_mlp.fused_full_t with an int8-packed params dict:
    (IN_ROWS, N) f32 coords/dirs -> (OUT_ROWS, N) f32, rgb rows 0-2, σ row 3."""
    kernel = functools.partial(_full_kernel_int8, depth, skips)
    return _run_t(kernel, _int8_names(depth, skips), packed, [xyzT, dirT])


def fused_sigma_t_int8(packed: Dict[str, jnp.ndarray], xyzT: jnp.ndarray,
                       depth: int = 8, skips=(4,)) -> jnp.ndarray:
    kernel = functools.partial(_sigma_kernel_int8, depth, skips)
    return _run_t(kernel, _int8_names(depth, skips), packed, [xyzT])


def pack_model_params_int8(params: Dict[str, Any],
                           cfg: NeRFConfig = NeRFConfig(),
                           n_freqs_xyz: int = 10, n_freqs_dir: int = 4):
    """Pack each NeRF field in a {'coarse','fine',...} dict for the int8
    kernel. No calibration inputs (dynamic per-point activation scales).
    Skips non-field subtrees (e.g. the distilled proxy), like
    fused_mlp.pack_model_params.
    """
    out = {}
    for k, v in params.items():
        if "xyz_layers" not in v:
            continue
        out[k] = pack_nerf_params_int8(v, cfg, n_freqs_xyz, n_freqs_dir)
    return out
