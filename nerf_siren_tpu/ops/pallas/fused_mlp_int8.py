"""int8 variant of the fused NeRF field kernel (trunk on the int8 MXU path).

Why: BASELINE.md's FLOP-arithmetic section shows dense (~40%+-foreground)
frames are compute-bound past ~4.7M rays/s @ 32 dB for any renderer that
evaluates the full 8x256 field per survivor in bf16 — the MXU's int8 mode
is the only remaining lever. Measured in-kernel on the v5e (round 3,
docs/status.md): an int8 layer chain with full requant epilogue runs 2.39x
the bf16 chain (raw int8 2.78x).

What is quantized (mirrors tools/int8_quality.py, which measures the
rendered-quality cost of exactly this split):
  - the 8x256 xyz trunk's matmuls: weights int8 per-output-row, activations
    int8 with STATIC per-tensor scales (calibrated once per checkpoint at
    pack time from stratified scene samples);
  - the positional-encoding sin/cos operand has range [-1, 1] by
    construction — fixed scale 1/127, no calibration;
  - raw coordinates keep a scene-box scale (they only enter as the tiny
    3-column linear term of layer 0 / the skip layer).
Everything else — the sin arguments themselves (f32: 2^9-scaled coordinates
cannot survive int8), sigma/rgb/direction heads (<10% of FLOPs), biases,
final trunk activation — stays f32/bf16, identical to fused_mlp.py.

Dequant scales fold: at pack time each weight's per-row scale is multiplied
by its operand's static activation scale, so the kernel epilogue is one
(O,1)-column multiply per matmul — then bias+relu+requant (round/clip/cast),
the same epilogue the 2.39x microbenchmark paid for.

Layout, tiling, two-half pipelining, head math: identical to fused_mlp.py
(v3 transposed). Reference being replaced: the per-chunk MLP hot loop,
/root/reference/models/rendering.py:140-190. Inference-only, and NOT a
parity surface: the parity/training paths keep f32/bf16; this kernel serves
the fast proxy-culled renderer where quality is measured as agreement dB
(tools/fast_frontier.py --int8).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.models.embedding import positional_encoding
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
# calibration + packing
# ---------------------------------------------------------------------------

def calibrate_act_scales(params_field: Dict[str, Any],
                         xyz: jnp.ndarray,
                         cfg: NeRFConfig = NeRFConfig(),
                         percentile: Optional[float] = None) -> Dict[str, float]:
    """Static activation absmax (or percentile) per trunk matmul operand.

    xyz: (N, 3) representative scene points (e.g. stratified samples along
    a few thousand rays). Returns {'x': s, 'h1': s, ..., 'h7': s} — 'e' is
    omitted (sin/cos range is exactly [-1, 1]). One jitted stats pass.
    """
    @jax.jit
    def stats(p, pts):
        emb = positional_encoding(pts, 10)
        x, e = emb[:, :3], emb[:, 3:]
        out = {"x": jnp.max(jnp.abs(x))} if percentile is None else \
            {"x": jnp.percentile(jnp.abs(x).ravel(), percentile)}
        h = None
        for i in range(cfg.depth):
            L = p["xyz_layers"][i]
            w = L["kernel"]
            if i == 0:
                y = x @ w[:3] + e @ w[3:]
            else:
                if i in cfg.skips:
                    y = x @ w[:3] + e @ w[3:EMB_X] + h @ w[EMB_X:]
                else:
                    y = h @ w
                out[f"h{i}"] = jnp.max(jnp.abs(h)) if percentile is None \
                    else jnp.percentile(jnp.abs(h).ravel(), percentile)
            h = jax.nn.relu(y + L["bias"])
        return out

    return {k: float(v) for k, v in
            jax.device_get(stats(params_field, jnp.asarray(xyz))).items()}


def _quant_rows(w_t: np.ndarray):
    """Per-output-row symmetric int8 for a transposed (O, I) weight.
    Returns (int8 (O, I), f32 row scales (O, 1))."""
    s = np.max(np.abs(w_t), axis=1, keepdims=True) / 127.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.round(w_t / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def pack_nerf_params_int8(params: Dict[str, Any],
                          act_scales: Dict[str, float],
                          cfg: NeRFConfig = NeRFConfig(),
                          n_freqs_xyz: int = 10,
                          n_freqs_dir: int = 4) -> Dict[str, jnp.ndarray]:
    """Kernel layout for the int8 trunk + bf16 heads.

    act_scales: calibrate_act_scales output. Per-matmul dequant scales are
    folded as row_scale * act_scale at pack time; requant uses
    inv_h{i} = 1 / act_scale(h_i) columns. Head keys are reused verbatim
    from the bf16 pack.
    """
    assert cfg.skips == (4,), "kernel supports the reference skip=(4,) topology"
    assert n_freqs_xyz == 10 and n_freqs_dir == 4, "row layout is fixed"
    base = pack_nerf_params(params, cfg, n_freqs_xyz, n_freqs_dir)
    out: Dict[str, jnp.ndarray] = {k: base[k] for k in (
        "sx", "px", "sd", "pd", "w_sigma", "b_sigma",
        "w_comb", "b_comb", "wdx", "wds", "w_rgb", "b_rgb")}

    s_x = float(act_scales["x"]) / 127.0
    s_e = 1.0 / 127.0
    out["inv_x"] = jnp.full((1, 1), 1.0 / s_x, jnp.float32)
    layers = params["xyz_layers"]

    def f32t(x):
        return np.asarray(x, np.float32).T  # (O, I)

    for i in range(cfg.depth):
        k_t = f32t(layers[i]["kernel"])
        s_h = None if i == 0 else float(act_scales[f"h{i}"]) / 127.0
        if i == 0 or i in cfg.skips:
            w_x, w_s = _split_embed_cols(k_t[:, :EMB_X], n_freqs_xyz)
            qx, sx_row = _quant_rows(w_x)
            qs, ss_row = _quant_rows(w_s)
            out[f"q{i}x"] = jnp.asarray(qx)
            out[f"f{i}x"] = jnp.asarray(sx_row * s_x)
            out[f"q{i}s"] = jnp.asarray(qs)
            out[f"f{i}s"] = jnp.asarray(ss_row * s_e)
            if i in cfg.skips:
                qh, sh_row = _quant_rows(k_t[:, EMB_X:])
                out[f"q{i}h"] = jnp.asarray(qh)
                out[f"f{i}h"] = jnp.asarray(sh_row * s_h)
        else:
            qh, sh_row = _quant_rows(k_t)
            out[f"q{i}"] = jnp.asarray(qh)
            out[f"f{i}"] = jnp.asarray(sh_row * s_h)
        out[f"b{i}"] = base[f"b{i}"]
        if i + 1 < cfg.depth:  # requant target scale for h_{i+1}'s producer
            out[f"inv_h{i + 1}"] = jnp.float32(
                1.0 / (float(act_scales[f"h{i + 1}"]) / 127.0)).reshape(1, 1)
    return out


def _int8_names(depth, skips):
    names = ["sx", "px", "inv_x", "q0x", "f0x", "q0s", "f0s", "b0", "inv_h1"]
    for i in range(1, depth):
        if i in skips:
            names += [f"q{i}x", f"f{i}x", f"q{i}s", f"f{i}s",
                      f"q{i}h", f"f{i}h", f"b{i}"]
        else:
            names += [f"q{i}", f"f{i}", f"b{i}"]
        if i + 1 < depth:
            names.append(f"inv_h{i + 1}")
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


def _requant(y_f32, inv_s):
    """f32 -> int8 at scale 1/inv_s (relu already applied upstream)."""
    return jnp.clip(jnp.round(y_f32 * inv_s), -127.0, 127.0).astype(jnp.int8)


def _trunk_int8(refs, x_ref, depth, skips, parts=2):
    """int8 trunk over `parts` skewed lane-slices; returns (hs, _) with hs
    the final bf16 activations (W, T/P) — head-compatible with fused_mlp."""
    tile = x_ref.shape[1]
    q = tile // parts

    def emb_q(x):
        e = jnp.sin(_dot_f32(refs["sx"][...], x) + refs["px"][...])
        return _requant(e, 127.0)

    def stage0(xq, eq):
        return (_dot_i8(refs["q0x"][...], xq).astype(jnp.float32)
                * refs["f0x"][...]
                + _dot_i8(refs["q0s"][...], eq).astype(jnp.float32)
                * refs["f0s"][...])

    def stage(i, hq, xq, eq):
        y = _dot_i8(refs[f"q{i}h" if i in skips else f"q{i}"][...],
                    hq).astype(jnp.float32) \
            * refs[f"f{i}h" if i in skips else f"f{i}"][...]
        if i in skips:
            y = (y + _dot_i8(refs[f"q{i}x"][...], xq).astype(jnp.float32)
                 * refs[f"f{i}x"][...]
                 + _dot_i8(refs[f"q{i}s"][...], eq).astype(jnp.float32)
                 * refs[f"f{i}s"][...])
        return y

    xqs, eqs, ys = [], [], []
    for p in range(parts):
        x = x_ref[:, p * q:(p + 1) * q]
        # x rows beyond 3 are zero (quantize to 0); coords use the static
        # scene-box scale folded into f0x / f{skip}x at pack time
        xq = _requant(x, refs["inv_x"][...])
        eq = emb_q(x)
        xqs.append(xq)
        eqs.append(eq)
        ys.append(stage0(xq, eq))
    hs = [None] * parts
    # wavefront: at wave w, part p computes layer (w - p); the epilogue is
    # bias+relu+requant instead of fused_mlp's bias+relu+bf16-cast
    for wave in range(1, depth + parts):
        for p in range(parts):
            layer = wave - p
            if 1 <= layer <= depth - 1:
                h_f = jax.nn.relu(ys[p] + refs[f"b{layer-1}"][...])
                hs[p] = _requant(h_f, refs[f"inv_h{layer}"][...])
                ys[p] = stage(layer, hs[p], xqs[p], eqs[p])
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


def default_calib_points(scene_aabb, n: int = 65536,
                         key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Uniform calibration points over the scene AABB (min, max) pair."""
    lo = jnp.asarray(scene_aabb[0], jnp.float32)
    hi = jnp.asarray(scene_aabb[1], jnp.float32)
    key = jax.random.PRNGKey(0) if key is None else key
    u = jax.random.uniform(key, (n, 3), jnp.float32)
    return lo + u * (hi - lo)


def pack_model_params_int8(params: Dict[str, Any],
                           calib_xyz: jnp.ndarray,
                           cfg: NeRFConfig = NeRFConfig(),
                           percentile: Optional[float] = None,
                           n_freqs_xyz: int = 10, n_freqs_dir: int = 4):
    """Calibrate + pack each NeRF field in a {'coarse','fine',...} dict.

    calib_xyz: (N, 3) representative scene points shared by all fields.
    Skips non-field subtrees (e.g. the distilled proxy), like
    fused_mlp.pack_model_params.
    """
    out = {}
    for k, v in params.items():
        if "xyz_layers" not in v:
            continue
        scales = calibrate_act_scales(v, calib_xyz, cfg, percentile)
        out[k] = pack_nerf_params_int8(v, scales, cfg, n_freqs_xyz,
                                       n_freqs_dir)
    return out
