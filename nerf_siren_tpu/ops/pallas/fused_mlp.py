"""Fused NeRF field evaluation as a Pallas TPU kernel (v3, transposed).

Replaces the reference's per-chunk MLP hot loop
(reference: models/rendering.py:140-190) for the eval/bench path. All
weights (~1.3 MB bf16) stay VMEM-resident across grid steps; one point
tile's activations never leave VMEM.

What makes it fast (every choice measured on a real v5e chip; the practical
matmul peak there is 131 TF/s bf16):

- **Transposed point layout (v3)**: points live in the LANE dimension —
  coordinates stream as (8, N) f32 and results come back as (8, N) f32.
  The v2 kernel consumed (N, 4) / produced (N, 8); XLA tiles such narrow
  arrays as T(8,128) with 4 of 128 lanes used, so every pad / broadcast /
  slice around the kernel ran at ~1/30 of HBM bandwidth — ~900 ms of a
  2.5 s frame was narrow-array data movement. In (8, N) orientation every
  surrounding op is a full-bandwidth lane-major op, and the activations
  inside the kernel are (C, T) with C=256 sublanes: the same MXU matmuls,
  transposed.
- **MXU embedding**: the positional encoding is computed as
  ``sin(S @ X + P)`` — a (64,8)x(8,T) matmul builds all 2^k-scaled
  coordinates at once, and the cos half rides the same sin via a +pi/2 phase
  row. (v1 built the embedding with lane-level concats/iota/exp2, which
  Mosaic lowers to relayouts that cost as much as two trunk layers.)
- **Two-half software pipelining**: the tile is split in half (along lanes)
  and the halves run skewed by one layer, so half B's VPU epilogue
  (bias+relu+cast) overlaps half A's MXU matmul.
- **128-row head compute, 8-row store**: MXU output sublanes pad to 128
  regardless, so the sigma/rgb heads run at 128 output rows for free and
  only 8 rows are stored — the (8, N) f32 result is 32 B/point of HBM out.
- **Folded direction branch**: the reference applies
  ``dir_layer([xyz_final(h), dir_emb])`` with no nonlinearity between the
  two linears (reference models/nerf.py:98-111), so
  ``W_comb = W_dir[:256]^T @ W_xyz_final^T`` is precomputed in f32 — one
  (128,256) matmul replaces a (256,256) and a (128,256), 14% fewer FLOPs
  on the full pass at ~1e-4 max output delta.

Numerics match the jnp path (`models.nerf.apply_nerf` with
compute_dtype=bfloat16): bf16 operands, f32 accumulation; asserted in tests.

Inference-only: training keeps the jnp field (autodiff); this kernel serves
eval/bench and the test-time sigma-only pass (see render/fused.py for the
end-to-end transposed renderer).
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

TILE_N = 4096  # points (lanes) per grid step; two pipelined halves of TILE_N/2
# (swept on-chip: 2048 -> 104/92 Mpts/s sigma/full, 4096 -> 107/94, 8192 OOMs
# the 16 MB scoped-vmem stack for the full kernel)

IN_ROWS = 8        # input rows: [x, y, z, 0, 0, 0, 0, 0] (f32 sublane quantum)
EMB_X_ROWS = 64    # 30 sin + 30 cos + 4 pad (n_freqs_xyz=10)
EMB_D_ROWS = 32    # 12 sin + 12 cos + 8 pad (n_freqs_dir=4)
SIGMA_ROW = 3      # sigma lands on this output row ([r, g, b, sigma, 0...])
OUT_ROWS = 8       # stored output rows (head compute runs at 128, store slices)


def _embed_perm(n_freqs: int, in_ch: int = 3) -> np.ndarray:
    """Row permutation: [x | sin k-major | cos k-major] -> reference
    interleave [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]
    (reference models/nerf.py:33-38)."""
    idx = list(range(in_ch))
    for k in range(n_freqs):
        idx.extend(in_ch + 2 * in_ch * k + c for c in range(in_ch))
    for k in range(n_freqs):
        idx.extend(2 * in_ch + 2 * in_ch * k + c for c in range(in_ch))
    return np.asarray(idx)


def _embed_matrices_t(n_freqs: int, rows: int):
    """S (rows, IN_ROWS) frequency matrix and P (rows, 1) phase column such
    that sin(S @ X + P) = [sin(2^k x_c) | cos(2^k x_c) | 0-pad] (k-major,
    rows) for X = (IN_ROWS, T) with coordinates in the first 3 rows."""
    S = np.zeros((rows, IN_ROWS), np.float32)
    P = np.zeros((rows, 1), np.float32)
    n = 3 * n_freqs
    for k in range(n_freqs):
        for c in range(3):
            S[3 * k + c, c] = 2.0 ** k
            S[n + 3 * k + c, c] = 2.0 ** k
            P[n + 3 * k + c, 0] = np.pi / 2
    return S, P


def _split_embed_cols(w_t: np.ndarray, n_freqs: int):
    """Split a transposed (out, emb_ch) weight into passthrough columns
    (out, IN_ROWS) and sin/cos columns (out, rows) in k-major row order."""
    perm = _embed_perm(n_freqs)
    w_t = w_t[:, perm]
    out = w_t.shape[0]
    rows = EMB_X_ROWS if n_freqs == 10 else EMB_D_ROWS
    w_x = np.concatenate(
        [w_t[:, :3], np.zeros((out, IN_ROWS - 3), np.float32)], 1)
    w_s = np.concatenate(
        [w_t[:, 3:], np.zeros((out, rows - (w_t.shape[1] - 3)), np.float32)], 1)
    return w_x, w_s


def _bias_col(b: np.ndarray, rows: int = 0, at: int = 0) -> jnp.ndarray:
    b = np.asarray(b, np.float32)
    if rows:
        col = np.zeros((rows,), np.float32)
        col[at: at + b.shape[0]] = b
        b = col
    return jnp.asarray(b.reshape(-1, 1))


def pack_nerf_params(params: Dict[str, Any], cfg: NeRFConfig = NeRFConfig(),
                     n_freqs_xyz: int = 10, n_freqs_dir: int = 4) -> Dict[str, jnp.ndarray]:
    """Convert standard NeRF params into the kernel's transposed bf16 layout."""
    assert cfg.skips == (4,), "kernel supports the reference skip=(4,) topology"
    assert cfg.width % 128 == 0 and cfg.depth >= 2
    assert n_freqs_xyz == 10 and n_freqs_dir == 4, "row layout is fixed"
    bf = jnp.bfloat16
    W = cfg.width
    emb_x = 3 * (2 * n_freqs_xyz + 1)  # 63

    def f32t(x):
        return np.asarray(x, np.float32).T  # (out, in)

    out: Dict[str, jnp.ndarray] = {}
    # frequency matrices stay f32: scaling 2^k amplifies any bf16 rounding
    # of the coordinate, so sin arguments must be formed at f32
    S, P = _embed_matrices_t(n_freqs_xyz, EMB_X_ROWS)
    out["sx"], out["px"] = jnp.asarray(S), jnp.asarray(P)
    S, P = _embed_matrices_t(n_freqs_dir, EMB_D_ROWS)
    out["sd"], out["pd"] = jnp.asarray(S), jnp.asarray(P)

    layers = params["xyz_layers"]
    for i in range(cfg.depth):
        k_t = f32t(layers[i]["kernel"])  # (out, in)
        if i == 0 or i in cfg.skips:
            # reference concat order is [emb, h] (models/nerf.py:109)
            w_x, w_s = _split_embed_cols(k_t[:, :emb_x], n_freqs_xyz)
            out[f"w{i}x"] = jnp.asarray(w_x, bf)
            out[f"w{i}s"] = jnp.asarray(w_s, bf)
            if i in cfg.skips:
                out[f"w{i}h"] = jnp.asarray(k_t[:, emb_x:], bf)
        else:
            out[f"w{i}"] = jnp.asarray(k_t, bf)
        out[f"b{i}"] = _bias_col(layers[i]["bias"])

    # sigma head on output row SIGMA_ROW; 128 rows (MXU pads M anyway)
    w_sig = np.zeros((128, W), np.float32)
    w_sig[SIGMA_ROW] = np.asarray(params["sigma"]["kernel"], np.float32)[:, 0]
    out["w_sigma"] = jnp.asarray(w_sig, bf)
    out["b_sigma"] = _bias_col(np.asarray(params["sigma"]["bias"], np.float32),
                               128, SIGMA_ROW)

    # folded direction branch (no nonlinearity between xyz_final and
    # dir_layer in the reference, models/nerf.py:98-111)
    wd_t = f32t(params["dir_layer"]["kernel"])        # (W//2, W + 27)
    wf_t = f32t(params["xyz_final"]["kernel"])        # (W, W)
    w_comb = wd_t[:, :W] @ wf_t                       # (W//2, W)
    b_comb = (wd_t[:, :W] @ np.asarray(params["xyz_final"]["bias"], np.float32)
              + np.asarray(params["dir_layer"]["bias"], np.float32))
    w_dx, w_ds = _split_embed_cols(wd_t[:, W:], n_freqs_dir)
    out["w_comb"] = jnp.asarray(w_comb, bf)
    out["b_comb"] = _bias_col(b_comb)
    out["wdx"] = jnp.asarray(w_dx, bf)
    out["wds"] = jnp.asarray(w_ds, bf)

    w_rgb = np.zeros((128, W // 2), np.float32)
    w_rgb[:3] = np.asarray(params["rgb"]["kernel"], np.float32).T
    out["w_rgb"] = jnp.asarray(w_rgb, bf)
    out["b_rgb"] = _bias_col(np.asarray(params["rgb"]["bias"], np.float32), 128, 0)
    return out


def _sigma_names(depth, skips):
    names = ["sx", "px", "w0x", "w0s", "b0"]
    for i in range(1, depth):
        if i in skips:
            names += [f"w{i}x", f"w{i}s", f"w{i}h", f"b{i}"]
        else:
            names += [f"w{i}", f"b{i}"]
    return names + ["w_sigma", "b_sigma"]


def _full_names(depth, skips):
    return _sigma_names(depth, skips) + [
        "sd", "pd", "w_comb", "b_comb", "wdx", "wds", "w_rgb", "b_rgb"]


def _dot(w, a):
    """(O, I) bf16 @ (I, T) -> (O, T) f32 accumulate."""
    return jax.lax.dot_general(w, a.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_f32(w, a):
    """Full-precision matmul for the tiny (rows,8)x(8,T) embedding scale."""
    return jax.lax.dot_general(w, a.astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


PIPELINE_PARTS = 2  # lane-split parts of the tile run skewed by one layer
# (swept on-chip at TILE=4096: P=1 107.8/93.9 Mpts/s sigma/full, P=2
# 105.0/94.2, P=4 106.6/92.4, P=8 104.5/88.6 — the explicit skew mattered at
# TILE=2048 (+10%) but is scheduling-neutral at 4096; TILE=8192 is slower at
# any P and OOMs scoped vmem at P=8)


def _trunk_pipelined(refs, x_ref, depth, skips):
    """Run the xyz trunk over PIPELINE_PARTS skewed lane-slices of the tile.

    Part p runs one layer behind part p-1, so part p's VPU epilogue
    (bias+relu+cast) is textually interleaved between the other parts' MXU
    matmuls — Mosaic schedules mostly in program order, and the explicit
    skew measured ~10% device win at 2 parts. Returns (hs, xs): lists of
    final bf16 activations (W, T/P) and f32 inputs (IN_ROWS, T/P)."""
    bf = jnp.bfloat16
    parts = PIPELINE_PARTS
    tile = x_ref.shape[1]
    q = tile // parts

    def emb_of(x):
        return jnp.sin(_dot_f32(refs["sx"][...], x) + refs["px"][...]).astype(bf)

    def stage0(x, e):
        return _dot(refs["w0x"][...], x) + _dot(refs["w0s"][...], e)

    def stage(i, h, x, e):
        y = _dot(refs[f"w{i}h" if i in skips else f"w{i}"][...], h)
        if i in skips:
            y = y + _dot(refs[f"w{i}x"][...], x) + _dot(refs[f"w{i}s"][...], e)
        return y

    xs, es, ys = [], [], []
    for p in range(parts):
        x = x_ref[:, p * q:(p + 1) * q]
        e = emb_of(x)
        xs.append(x)
        es.append(e)
        ys.append(stage0(x, e))
    hs = [None] * parts
    # wavefront: at wave w, part p computes layer (w - p)
    for wave in range(1, depth + parts):
        for p in range(parts):
            layer = wave - p
            if 1 <= layer <= depth - 1:
                hs[p] = jax.nn.relu(ys[p] + refs[f"b{layer-1}"][...]).astype(bf)
                ys[p] = stage(layer, hs[p], xs[p], es[p])
    for p in range(parts):
        hs[p] = jax.nn.relu(ys[p] + refs[f"b{depth-1}"][...]).astype(bf)
    return hs, xs


def _sigma_kernel(depth, skips, x_ref, *args):
    *w_refs, out_ref = args
    refs = dict(zip(_sigma_names(depth, skips), w_refs))
    hs, _ = _trunk_pipelined(refs, x_ref, depth, skips)
    q = x_ref.shape[1] // len(hs)
    for p, h in enumerate(hs):
        out_ref[:, p * q:(p + 1) * q] = (
            _dot(refs["w_sigma"][...], h) + refs["b_sigma"][...])[:OUT_ROWS, :]


def _full_kernel(depth, skips, x_ref, d_ref, *args):
    *w_refs, out_ref = args
    refs = dict(zip(_full_names(depth, skips), w_refs))
    bf = jnp.bfloat16

    hs, _ = _trunk_pipelined(refs, x_ref, depth, skips)
    q = x_ref.shape[1] // len(hs)

    def heads(h, d):
        sig = _dot(refs["w_sigma"][...], h) + refs["b_sigma"][...]   # (128,T/P)
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


def _run_t(kernel_fn, names, packed, point_inputs):
    """point_inputs: list of (IN_ROWS, N) f32, N a multiple of the tile.
    Returns (OUT_ROWS, N) f32."""
    n_padded = point_inputs[0].shape[1]
    tile = min(TILE_N, n_padded)
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


def _pad_lanes(xT: jnp.ndarray, tile: int) -> jnp.ndarray:
    n = xT.shape[1]
    pad = -n % tile
    return jnp.pad(xT, ((0, IN_ROWS - xT.shape[0]), (0, pad)))


def fused_sigma_t(packed: Dict[str, jnp.ndarray], xyzT: jnp.ndarray,
                  depth: int = 8, skips=(4,)) -> jnp.ndarray:
    """Raw field σ-pass in transposed layout.

    xyzT: (<=IN_ROWS, N) f32, coordinates in rows 0-2, N a multiple of the
    tile (pad with _pad_lanes). Returns (OUT_ROWS, N) f32; σ on SIGMA_ROW."""
    kernel = functools.partial(_sigma_kernel, depth, skips)
    return _run_t(kernel, _sigma_names(depth, skips), packed, [xyzT])


def fused_full_t(packed: Dict[str, jnp.ndarray], xyzT: jnp.ndarray,
                 dirT: jnp.ndarray, depth: int = 8, skips=(4,)) -> jnp.ndarray:
    """Raw field full pass in transposed layout: rgb rows 0-2, σ row 3."""
    kernel = functools.partial(_full_kernel, depth, skips)
    return _run_t(kernel, _full_names(depth, skips), packed, [xyzT, dirT])


@functools.partial(jax.jit, static_argnames=("depth", "skips"))
def fused_nerf_sigma(packed: Dict[str, jnp.ndarray], xyz: jnp.ndarray,
                     depth: int = 8, skips=(4,)) -> jnp.ndarray:
    """Raw sigma for (N, 3) points; returns (N, 1) f32.

    Convenience/test entry — transposes on the way in. The hot path should
    build coordinates transposed and call fused_sigma_t directly."""
    n = xyz.shape[0]
    xyzT = _pad_lanes(xyz.T, TILE_N)
    out = fused_sigma_t(packed, xyzT, depth=depth, skips=skips)
    return out[SIGMA_ROW, :n].reshape(n, 1)


@functools.partial(jax.jit, static_argnames=("depth", "skips"))
def fused_nerf_full(packed: Dict[str, jnp.ndarray], xyz: jnp.ndarray,
                    dirs: jnp.ndarray, depth: int = 8, skips=(4,)) -> jnp.ndarray:
    """[rgb, sigma] for (N, 3) points with per-point (N, 3) directions → (N, 4)."""
    n = xyz.shape[0]
    xyzT = _pad_lanes(xyz.T, TILE_N)
    dirT = _pad_lanes(dirs.T, TILE_N)
    out = fused_full_t(packed, xyzT, dirT, depth=depth, skips=skips)
    return out[:4, :n].T


def pack_model_params(params: Dict[str, Any], cfg: NeRFConfig = NeRFConfig(),
                      n_freqs_xyz: int = 10, n_freqs_dir: int = 4):
    """Pack each NeRF field in a {'coarse': ..., 'fine': ...} dict.

    Non-field subtrees are skipped: the culled training backends keep a
    distilled placement proxy under params['proxy'] ({'l1','l2'}), which
    has no kernel packing and would KeyError in pack_nerf_params.
    """
    return {k: pack_nerf_params(v, cfg, n_freqs_xyz, n_freqs_dir)
            for k, v in params.items() if "xyz_layers" in v}


def make_fused_field_fn(rays_d: jnp.ndarray, cfg: NeRFConfig = NeRFConfig()):
    """A render_rays `field_fn` backed by the fused kernels.

    Compatibility shim (tests, drop-in use with render_rays). The production
    eval path is render/fused.py::render_rays_fused, which keeps every
    intermediate in the transposed lane-major layout instead of paying the
    (R,S,3) <-> (8,N) relayouts this shim incurs per call.
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
