"""Fused NeRF field training kernels (Pallas TPU): forward + backward.

Why: the training step is HBM-bound on ACTIVATION traffic, not FLOPs —
every jnp layer round-trips a (N, 256) activation through HBM (134 MB bf16
at the recipe's 262K points), and the backward pass reads each one again
for its weight-grad matmul. Measured on-chip: field fwd+bwd 19-23 ms vs a
~7 ms compute roofline (docs/status.md). These kernels keep a point tile's
ENTIRE forward state in VMEM: the backward kernel REMATERIALIZES the
forward (cheap — it is compute-balanced) and produces all parameter
gradients in one pass, accumulating (O, I) f32 wgrads across grid steps in
VMEM-resident output blocks (the sequential TPU grid makes read-modify-
write accumulation safe).

Scope: the reference NeRF topology (depth 8, skips=(4,), width 256,
n_freqs 10/4, no semantic head) — the same contract as the inference
kernel (fused_mlp.py). Unlike it, the heads here stay UNFOLDED
(xyz_final and dir_layer separate) because their gradients are separate
parameters. Packing runs under jit (pure jnp transforms of the python
param pytree), so `fused_field_train` exposes a jax.custom_vjp with
gradients in the ORIGINAL param layout — it drops into the training loss
like apply_nerf. bf16 operands / f32 accumulation both directions (mixed
precision; the f32 parity path remains the default trainer).

Replaces the reference's training hot loop (reference:
models/rendering.py:140-190 inference chunks driving nerf.py:41-124
forward/backward under torch autograd).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.ops.pallas.fused_mlp import (
    EMB_D_ROWS,
    EMB_X_ROWS,
    IN_ROWS,
    SIGMA_ROW,
    _dot_f32,
    _embed_matrices_t,
    _embed_perm,
)

TILE_T = 1024   # points per grid step (the bwd kernel's 8 stored (W, T)
                # activations + f32 dz chain OOM the 16 MB scoped-vmem
                # stack at 2048 — measured 20.18M on-chip)
W = 256         # trunk width (reference topology)
HD = 128        # dir-branch width (W // 2)
DEPTH = 8
SKIP = 4
N_FREQS_XYZ = 10
N_FREQS_DIR = 4
EMB_X = 63      # 3 * (2*10 + 1)
EMB_D = 27      # 3 * (2*4 + 1)


def _perm_inv(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return inv


_PERM_X = _embed_perm(N_FREQS_XYZ)          # python emb order -> kernel order
_PERM_D = _embed_perm(N_FREQS_DIR)


def _split_cols_jnp(k_t: jax.Array, perm: np.ndarray, rows: int):
    """jit-traceable _split_embed_cols: (O, emb) -> (O, IN_ROWS), (O, rows)."""
    k_t = k_t[:, perm]
    out = k_t.shape[0]
    w_x = jnp.concatenate(
        [k_t[:, :3], jnp.zeros((out, IN_ROWS - 3), k_t.dtype)], axis=1)
    w_s = jnp.concatenate(
        [k_t[:, 3:], jnp.zeros((out, rows - (k_t.shape[1] - 3)), k_t.dtype)],
        axis=1)
    return w_x, w_s


def _bias_col_jnp(b: jax.Array, rows: int = 0, at: int = 0) -> jax.Array:
    b = b.astype(jnp.float32)
    if rows:
        col = jnp.zeros((rows,), jnp.float32)
        b = col.at[at: at + b.shape[0]].set(b)
    return b.reshape(-1, 1)


def pack_train_params(params: Dict[str, Any],
                      cfg: NeRFConfig = NeRFConfig()) -> Dict[str, jax.Array]:
    """jit-traceable pack of one model's params into the training-kernel
    layout: bf16 (O, I) forward weights, bf16 transposed copies for the
    dgrad chain, f32 bias columns, f32 embedding matrices."""
    assert cfg.depth == DEPTH and cfg.skips == (SKIP,) and cfg.width == W
    bf = jnp.bfloat16
    out: Dict[str, jax.Array] = {}

    S, P = _embed_matrices_t(N_FREQS_XYZ, EMB_X_ROWS)
    out["sx"], out["px"] = jnp.asarray(S), jnp.asarray(P)
    S, P = _embed_matrices_t(N_FREQS_DIR, EMB_D_ROWS)
    out["sd"], out["pd"] = jnp.asarray(S), jnp.asarray(P)

    layers = params["xyz_layers"]
    for i in range(DEPTH):
        k_t = layers[i]["kernel"].T.astype(jnp.float32)     # (O, I_py)
        if i == 0 or i == SKIP:
            w_x, w_s = _split_cols_jnp(k_t[:, :EMB_X], _PERM_X, EMB_X_ROWS)
            out[f"w{i}x"], out[f"w{i}s"] = w_x.astype(bf), w_s.astype(bf)
            if i == SKIP:
                wh = k_t[:, EMB_X:]
                out[f"w{i}h"] = wh.astype(bf)
                out[f"w{i}hT"] = wh.T.astype(bf)
        else:
            out[f"w{i}"] = k_t.astype(bf)
            out[f"w{i}T"] = k_t.T.astype(bf)
        out[f"b{i}"] = _bias_col_jnp(layers[i]["bias"])

    # sigma head: forward at 8 output rows (row SIGMA), transpose (W, 8)
    ws = params["sigma"]["kernel"].astype(jnp.float32)      # (W, 1)
    w_sig8 = jnp.zeros((8, W), jnp.float32).at[SIGMA_ROW].set(ws[:, 0])
    out["wsig"] = w_sig8.astype(bf)
    out["wsigT"] = w_sig8.T.astype(bf)                      # (W, 8)
    out["bsig"] = _bias_col_jnp(params["sigma"]["bias"], 8, SIGMA_ROW)

    wf = params["xyz_final"]["kernel"].T.astype(jnp.float32)  # (W, W)
    out["wf"], out["wfT"] = wf.astype(bf), wf.T.astype(bf)
    out["bf"] = _bias_col_jnp(params["xyz_final"]["bias"])

    wd_t = params["dir_layer"]["kernel"].T.astype(jnp.float32)  # (HD, W+27)
    wdf = wd_t[:, :W]
    out["wdf"], out["wdfT"] = wdf.astype(bf), wdf.T.astype(bf)
    w_dx, w_ds = _split_cols_jnp(wd_t[:, W:], _PERM_D, EMB_D_ROWS)
    out["wdx"], out["wds"] = w_dx.astype(bf), w_ds.astype(bf)
    out["bd"] = _bias_col_jnp(params["dir_layer"]["bias"])

    wr = params["rgb"]["kernel"].T.astype(jnp.float32)      # (3, HD)
    wr8 = jnp.zeros((8, HD), jnp.float32).at[:3].set(wr)
    out["wr"] = wr8.astype(bf)
    out["wrT"] = wr8.T.astype(bf)                           # (HD, 8)
    out["br"] = _bias_col_jnp(params["rgb"]["bias"], 8, 0)
    return out


_W_NAMES = None


def _weight_names():
    global _W_NAMES
    if _W_NAMES is None:
        names = ["sx", "px", "sd", "pd"]
        for i in range(DEPTH):
            if i == 0:
                names += ["w0x", "w0s", "b0"]
            elif i == SKIP:
                names += [f"w{i}x", f"w{i}s", f"w{i}h", f"w{i}hT", f"b{i}"]
            else:
                names += [f"w{i}", f"w{i}T", f"b{i}"]
        names += ["wsig", "wsigT", "bsig", "wf", "wfT", "bf",
                  "wdf", "wdfT", "wdx", "wds", "bd", "wr", "wrT", "br"]
        _W_NAMES = names
    return _W_NAMES


# grad outputs: (name, shape) in a fixed order
_GRAD_SPECS = (
    [("dw0x", (W, IN_ROWS)), ("dw0s", (W, EMB_X_ROWS)), ("db0", (W, 1))]
    + sum([[(f"dw{i}", (W, W)), (f"db{i}", (W, 1))]
           for i in range(1, DEPTH) if i != SKIP], [])
    + [(f"dw{SKIP}x", (W, IN_ROWS)), (f"dw{SKIP}s", (W, EMB_X_ROWS)),
       (f"dw{SKIP}h", (W, W)), (f"db{SKIP}", (W, 1))]
    + [("dwsig", (8, W)), ("dbsig", (8, 1)),
       ("dwf", (W, W)), ("dbf", (W, 1)),
       ("dwdf", (HD, W)), ("dwdx", (HD, IN_ROWS)), ("dwds", (HD, EMB_D_ROWS)),
       ("dbd", (HD, 1)),
       ("dwr", (8, HD)), ("dbr", (8, 1))]
)


def _op_dtype():
    """bf16 dot operands on TPU (MXU); f32 elsewhere — XLA:CPU's thunk
    runtime cannot execute bf16xbf16->f32 dots in this program shape
    (interpret-mode tests hit it under jit). Inputs are already
    bf16-ROUNDED (activations carry .astype(bf16)), so the CPU f32 dots
    see the same values as the TPU bf16 dots."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _mm(w: jax.Array, a: jax.Array) -> jax.Array:
    """(O, I) x (I, T) -> (O, T) f32-accumulated."""
    dt = _op_dtype()
    return jax.lax.dot_general(w.astype(dt), a.astype(dt),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a: jax.Array, b: jax.Array) -> jax.Array:
    """(O, T) x (I, T) contracting T -> (O, I) f32 (the wgrad form)."""
    dt = _op_dtype()
    return jax.lax.dot_general(a.astype(dt), b.astype(dt),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_tile(refs, x, d):
    """Recompute the forward for one (…, T) tile; returns intermediates."""
    bf = jnp.bfloat16
    emb = jnp.sin(_dot_f32(refs["sx"][...], x) + refs["px"][...]).astype(bf)
    hs = []
    y = _mm(refs["w0x"][...], x) + _mm(refs["w0s"][...], emb)
    h = jax.nn.relu(y + refs["b0"][...]).astype(bf)
    hs.append(h)
    for i in range(1, DEPTH):
        if i == SKIP:
            y = (_mm(refs[f"w{i}h"][...], h)
                 + _mm(refs[f"w{i}x"][...], x)
                 + _mm(refs[f"w{i}s"][...], emb))
        else:
            y = _mm(refs[f"w{i}"][...], h)
        h = jax.nn.relu(y + refs[f"b{i}"][...]).astype(bf)
        hs.append(h)
    sig = _mm(refs["wsig"][...], h) + refs["bsig"][...]        # (8, T)
    feat = (_mm(refs["wf"][...], h) + refs["bf"][...]).astype(bf)  # (W, T)
    demb = jnp.sin(_dot_f32(refs["sd"][...], d) + refs["pd"][...]).astype(bf)
    hd = jax.nn.relu(_mm(refs["wdf"][...], feat)
                     + _mm(refs["wdx"][...], d)
                     + _mm(refs["wds"][...], demb)
                     + refs["bd"][...]).astype(bf)               # (HD, T)
    rgb = jax.nn.sigmoid(_mm(refs["wr"][...], hd) + refs["br"][...])  # (8,T)
    return emb, hs, sig, feat, demb, hd, rgb


def forward_tile_jnp(packed: Dict[str, jax.Array], x: jax.Array,
                     d: jax.Array) -> jax.Array:
    """Pure-jnp twin of the kernel forward (same packed weights, same op
    order). Exists so tests can autodiff the EXACT formulation the backward
    kernel rematerializes — elementwise grad parity is only meaningful
    against identical relu masks."""
    class _R:                                        # ref-like shim
        def __init__(self, a):
            self.a = a

        def __getitem__(self, _):
            return self.a

    refs = {k: _R(v) for k, v in packed.items()}
    _, _, sig, _, _, _, rgb = _forward_tile(refs, x, d)
    row = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 0)
    return jnp.where(row < 3, rgb,
                     jnp.where(row == SIGMA_ROW, sig, 0.0))


def _fwd_kernel(x_ref, d_ref, *args):
    *w_refs, out_ref = args
    refs = dict(zip(_weight_names(), w_refs))
    x = x_ref[...]
    d = d_ref[...]
    _, _, sig, _, _, _, rgb = _forward_tile(refs, x, d)
    row = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 0)
    out_ref[...] = jnp.where(row < 3, rgb,
                             jnp.where(row == SIGMA_ROW, sig, 0.0))


def _bwd_kernel(x_ref, d_ref, dy_ref, *args):
    n_grads = len(_GRAD_SPECS)
    w_refs = args[:-n_grads]
    g_refs = dict(zip((n for n, _ in _GRAD_SPECS), args[-n_grads:]))
    refs = dict(zip(_weight_names(), w_refs))
    bf = jnp.bfloat16

    x = x_ref[...]
    d = d_ref[...]
    dy = dy_ref[...]                                        # (8, T) f32
    emb, hs, sig, feat, demb, hd, rgb = _forward_tile(refs, x, d)

    grads = {}

    # rgb head: dz_r rows 0-2 (sigmoid'), rows 3-7 zero
    row8 = jax.lax.broadcasted_iota(jnp.int32, rgb.shape, 0)
    dz_r = jnp.where(row8 < 3, dy * rgb * (1.0 - rgb), 0.0)  # (8, T) f32
    grads["dwr"] = _dot_t(dz_r, hd)
    grads["dbr"] = jnp.sum(dz_r, axis=1, keepdims=True)

    dhd = _mm(refs["wrT"][...], dz_r.astype(bf))            # (HD, T)
    dz_hd = jnp.where(hd.astype(jnp.float32) > 0, dhd, 0.0)
    grads["dwdf"] = _dot_t(dz_hd, feat)
    grads["dwdx"] = _dot_t(dz_hd, d)
    grads["dwds"] = _dot_t(dz_hd, demb)
    grads["dbd"] = jnp.sum(dz_hd, axis=1, keepdims=True)

    dfeat = _mm(refs["wdfT"][...], dz_hd.astype(bf))        # (W, T)
    grads["dwf"] = _dot_t(dfeat, hs[-1])
    grads["dbf"] = jnp.sum(dfeat, axis=1, keepdims=True)

    # sigma head: dz_sig = dy masked to row SIGMA
    dz_sig = jnp.where(row8 == SIGMA_ROW, dy, 0.0)           # (8, T)
    grads["dwsig"] = _dot_t(dz_sig, hs[-1])
    grads["dbsig"] = jnp.sum(dz_sig, axis=1, keepdims=True)

    dh = (_mm(refs["wfT"][...], dfeat.astype(bf))
          + _mm(refs["wsigT"][...], dz_sig.astype(bf)))     # (W, T)

    # trunk, last to first; hs[i] is layer i's relu output
    for i in range(DEPTH - 1, -1, -1):
        dz = jnp.where(hs[i].astype(jnp.float32) > 0, dh, 0.0)
        if i == 0:
            grads["dw0x"] = _dot_t(dz, x)
            grads["dw0s"] = _dot_t(dz, emb)
        elif i == SKIP:
            grads[f"dw{i}x"] = _dot_t(dz, x)
            grads[f"dw{i}s"] = _dot_t(dz, emb)
            grads[f"dw{i}h"] = _dot_t(dz, hs[i - 1])
        else:
            grads[f"dw{i}"] = _dot_t(dz, hs[i - 1])
        grads[f"db{i}"] = jnp.sum(dz, axis=1, keepdims=True)
        if i > 0:
            wT = refs[f"w{i}hT" if i == SKIP else f"w{i}T"][...]
            dh = _mm(wT, dz.astype(bf))

    first = pl.program_id(0) == 0
    for name, _ in _GRAD_SPECS:
        val = grads[name]

        @pl.when(first)
        def _(val=val, ref=g_refs[name]):
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _(val=val, ref=g_refs[name]):
            ref[...] += val


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _weight_names()]


def fused_train_fwd_t(packed: Dict[str, jax.Array], xyzT: jax.Array,
                      dirT: jax.Array) -> jax.Array:
    """Forward (unfolded heads): (8, N) f32 coords/dirs -> (8, N) f32
    [r, g, b, sigma, 0...]. N must be a multiple of TILE_T."""
    n = xyzT.shape[1]
    grid = (n // TILE_T,)
    point_spec = pl.BlockSpec((IN_ROWS, TILE_T), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[point_spec, point_spec] + _weight_specs(),
        out_specs=pl.BlockSpec((IN_ROWS, TILE_T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((IN_ROWS, n), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xyzT, dirT, *[packed[k] for k in _weight_names()])


def fused_train_bwd_t(packed: Dict[str, jax.Array], xyzT: jax.Array,
                      dirT: jax.Array, dyT: jax.Array) -> Dict[str, jax.Array]:
    """Backward: recompute + all param grads, accumulated over tiles."""
    n = xyzT.shape[1]
    grid = (n // TILE_T,)
    point_spec = pl.BlockSpec((IN_ROWS, TILE_T), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec(shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
                 for _, shape in _GRAD_SPECS]
    out_shapes = [jax.ShapeDtypeStruct(shape, jnp.float32)
                  for _, shape in _GRAD_SPECS]
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[point_spec, point_spec, point_spec] + _weight_specs(),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=jax.default_backend() != "tpu",
    )(xyzT, dirT, dyT, *[packed[k] for k in _weight_names()])
    return dict(zip((n for n, _ in _GRAD_SPECS), outs))


def _unpack_grads(g: Dict[str, jax.Array],
                  params: Dict[str, Any]) -> Dict[str, Any]:
    """Kernel-layout grads -> the python param pytree layout."""
    inv_x = _perm_inv(_PERM_X)
    inv_d = _perm_inv(_PERM_D)

    def merge_emb(gx, gs, n_emb, inv):
        cols = jnp.concatenate([gx[:, :3], gs[:, :n_emb - 3]], axis=1)
        return cols[:, inv]                                  # (O, n_emb)

    out: Dict[str, Any] = {"xyz_layers": []}
    for i in range(DEPTH):
        if i == 0 or i == SKIP:
            k_cols = merge_emb(g[f"dw{i}x"], g[f"dw{i}s"], EMB_X, inv_x)
            if i == SKIP:
                k_cols = jnp.concatenate([k_cols, g[f"dw{i}h"]], axis=1)
        else:
            k_cols = g[f"dw{i}"]
        out["xyz_layers"].append({"kernel": k_cols.T,
                                  "bias": g[f"db{i}"][:, 0]})
    out["sigma"] = {"kernel": g["dwsig"][SIGMA_ROW][:, None],
                    "bias": g["dbsig"][SIGMA_ROW]}
    out["xyz_final"] = {"kernel": g["dwf"].T, "bias": g["dbf"][:, 0]}
    d_cols = merge_emb(g["dwdx"], g["dwds"], EMB_D, inv_d)
    out["dir_layer"] = {
        "kernel": jnp.concatenate([g["dwdf"], d_cols], axis=1).T,
        "bias": g["dbd"][:, 0]}
    out["rgb"] = {"kernel": g["dwr"][:3].T, "bias": g["dbr"][:3, 0]}
    return out


@jax.custom_vjp
def fused_field_train(params: Dict[str, Any], xyzT: jax.Array,
                     dirT: jax.Array) -> jax.Array:
    """apply_nerf-equivalent full pass with a fused Pallas fwd AND bwd.

    params: ONE model's python param pytree (reference topology). xyzT /
    dirT: (8, N) f32 transposed coords/dirs, N a multiple of TILE_T.
    Returns (8, N) f32 [rgb, sigma] rows. Gradients flow to params only
    (coords/dirs are treated as constants — correct for NeRF training,
    where sample positions are data)."""
    packed = pack_train_params(params)
    return fused_train_fwd_t(packed, xyzT, dirT)


def _vjp_fwd(params, xyzT, dirT):
    packed = pack_train_params(params)
    out = fused_train_fwd_t(packed, xyzT, dirT)
    return out, (params, xyzT, dirT)


def _vjp_bwd(res, dy):
    params, xyzT, dirT = res
    packed = pack_train_params(params)
    g = fused_train_bwd_t(packed, xyzT, dirT, dy.astype(jnp.float32))
    dparams = _unpack_grads(g, params)
    return dparams, None, None


fused_field_train.defvjp(_vjp_fwd, _vjp_bwd)


def make_fused_train_field_fn(rays_d: jax.Array):
    """A render_rays `field_fn` backed by the fused training kernels.

    rays_d: (R, 3) ray directions to close over (field_fn receives
    pre-embedded directions, but the kernel embeds in-register). Training
    only — the coarse pass under test_time=False is a FULL evaluation, so
    dir_emb is always present; eval paths use the dedicated inference
    renderers (render/fused.py). Zero-padded tail points receive zero
    cotangents from the output slice, so they contribute nothing to the
    accumulated gradients."""

    def field_fn(p_model, xyz, dir_emb):
        assert dir_emb is not None, (
            "fused train field_fn serves full evaluations only "
            "(training never takes the sigma-only path)")
        r, s, _ = xyz.shape
        n = r * s
        pad = -n % TILE_T
        flat = xyz.reshape(n, 3).T                         # (3, n)
        xyzT = jnp.pad(flat, ((0, IN_ROWS - 3), (0, pad)))
        dirs = jnp.broadcast_to(rays_d[:, None, :], (r, s, 3)).reshape(n, 3).T
        dirT = jnp.pad(dirs, ((0, IN_ROWS - 3), (0, pad)))
        out = fused_field_train(p_model, xyzT, dirT)       # (8, n+pad)
        return out[:4, :n].T.reshape(r, s, 4)

    return field_fn
