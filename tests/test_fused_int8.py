"""int8 fused field kernel vs a jnp fake-quant reference.

The kernel must match a jnp implementation of the SAME quantization recipe
(per-output-row int8 weights, dynamic per-point activation scales, f32/bf16
heads) — the bit-match policy of SURVEY §7 applied to the quantized trunk.
The quality cost of the recipe itself vs f32 is measured separately on-chip
by tools/int8_quality.py (fake-quant) and tools/fast_frontier.py --int8
(this kernel); docs/int8_quality.json records it.

On CPU these run through the Pallas interpreter — small sizes only.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.models.layers import linear
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.ops.pallas import fused_mlp, fused_mlp_int8

EMB_X = 63


@pytest.fixture(scope="module", autouse=True)
def small_tile():
    old = fused_mlp.TILE_N
    fused_mlp.TILE_N = 128
    yield
    fused_mlp.TILE_N = old


@pytest.fixture(scope="module")
def setup():
    cfg = NeRFConfig()
    params = init_nerf(jax.random.PRNGKey(0), cfg)
    packed = fused_mlp_int8.pack_nerf_params_int8(params, cfg)
    return cfg, params, None, packed


def _fake_quant_ref(params, scales, cfg, xyz, dirs):
    """jnp mirror of the kernel's exact quantization recipe (f32 heads):
    per-output-row int8 weights, DYNAMIC per-point activation scales
    (round-4 recipe; `scales` is unused and kept for signature parity)."""
    def qw_rows(w_t_cols):
        row_s = np.maximum(
            np.max(np.abs(w_t_cols), axis=1, keepdims=True) / 127.0, 1e-12)
        q = np.clip(np.round(w_t_cols / row_s), -127, 127)
        return q * row_s  # dequantized effective weight (exact int math)

    def qa_dyn(a):
        s = np.maximum(np.max(np.abs(a), axis=-1, keepdims=True),
                       1e-9) / 127.0
        return np.clip(np.round(np.asarray(a) / s), -127, 127) * s

    def qa_fixed(a):
        return np.clip(np.round(np.asarray(a) * 127.0), -127, 127) / 127.0

    emb = np.asarray(positional_encoding(jnp.asarray(xyz), 10))
    x, e = emb[:, :3], emb[:, 3:]
    # the kernel quantizes the SIN/COS rows (its own k-major layout) at
    # 1/127; the interleaved jnp order quantizes identically elementwise.
    # NOTE the kernel's dynamic x scale is computed over the 8 padded rows
    # (rows 3+ zero) — identical to the 3-column absmax here.
    xq, eq = qa_dyn(x), qa_fixed(e)
    h = None
    for i in range(cfg.depth):
        L = params["xyz_layers"][i]
        w_t = np.asarray(L["kernel"], np.float32).T  # (O, I)
        if i == 0:
            y = (xq @ qw_rows(w_t[:, :3]).T + eq @ qw_rows(w_t[:, 3:]).T)
        elif i in cfg.skips:
            y = (xq @ qw_rows(w_t[:, :3]).T
                 + eq @ qw_rows(w_t[:, 3:EMB_X]).T
                 + qa_dyn(h) @ qw_rows(w_t[:, EMB_X:]).T)
        else:
            y = qa_dyn(h) @ qw_rows(w_t).T
        h = np.maximum(y + np.asarray(L["bias"]), 0.0)
    hj = jnp.asarray(h)
    sigma = linear(params["sigma"], hj)
    feat = linear(params["xyz_final"], hj)
    demb = positional_encoding(jnp.asarray(dirs), 4)
    hd = jax.nn.relu(linear(params["dir_layer"],
                            jnp.concatenate([feat, demb], -1)))
    rgb = jax.nn.sigmoid(linear(params["rgb"], hd))
    return np.asarray(jnp.concatenate([rgb, sigma], -1))


def test_full_matches_fake_quant_ref(setup):
    cfg, params, scales, packed = setup
    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (200, 3), minval=-1.4, maxval=1.4)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (200, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    n = xyz.shape[0]
    xyzT = fused_mlp._pad_lanes(xyz.T, fused_mlp.TILE_N)
    dirT = fused_mlp._pad_lanes(dirs.T, fused_mlp.TILE_N)
    out = fused_mlp_int8.fused_full_t_int8(packed, xyzT, dirT,
                                           depth=cfg.depth, skips=cfg.skips)
    got = np.asarray(out[:4, :n].T)
    ref = _fake_quant_ref(params, scales, cfg, xyz, dirs)

    # identical int math end-to-end; residual = bf16 heads + folded dir
    # branch (same residual the bf16 kernel carries vs apply_nerf)
    np.testing.assert_allclose(got[:, 3], ref[:, 3], atol=5e-2, rtol=2e-2)
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=2e-2)
    assert got[:, :3].min() >= 0 and got[:, :3].max() <= 1


def test_sigma_consistent_with_full(setup):
    cfg, params, scales, packed = setup
    xyz = jax.random.uniform(jax.random.PRNGKey(3), (130, 3),
                             minval=-1.4, maxval=1.4)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (130, 1))
    n = xyz.shape[0]
    xyzT = fused_mlp._pad_lanes(xyz.T, fused_mlp.TILE_N)
    dirT = fused_mlp._pad_lanes(dirs.T, fused_mlp.TILE_N)
    sig = fused_mlp_int8.fused_sigma_t_int8(packed, xyzT, depth=cfg.depth,
                                            skips=cfg.skips)
    full = fused_mlp_int8.fused_full_t_int8(packed, xyzT, dirT,
                                            depth=cfg.depth, skips=cfg.skips)
    np.testing.assert_allclose(
        np.asarray(sig[fused_mlp.SIGMA_ROW, :n]),
        np.asarray(full[fused_mlp.SIGMA_ROW, :n]), atol=1e-3, rtol=1e-3)


def test_int8_close_to_bf16_kernel(setup):
    """The quantized kernel tracks the bf16 kernel within fake-quant noise
    on random (untrained) weights — a sanity bound, not the quality gate
    (that is measured on trained scenes by tools/int8_quality.py)."""
    cfg, params, scales, packed = setup
    packed_bf = fused_mlp.pack_nerf_params(params, cfg)
    xyz = jax.random.uniform(jax.random.PRNGKey(4), (256, 3),
                             minval=-1.4, maxval=1.4)
    dirs = jax.random.normal(jax.random.PRNGKey(5), (256, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    n = xyz.shape[0]
    xyzT = fused_mlp._pad_lanes(xyz.T, fused_mlp.TILE_N)
    dirT = fused_mlp._pad_lanes(dirs.T, fused_mlp.TILE_N)
    a = np.asarray(fused_mlp.fused_full_t(packed_bf, xyzT, dirT,
                                          depth=cfg.depth,
                                          skips=cfg.skips)[:4, :n])
    b = np.asarray(fused_mlp_int8.fused_full_t_int8(packed, xyzT, dirT,
                                                    depth=cfg.depth,
                                                    skips=cfg.skips)[:4, :n])
    # rgb in [0,1]: absolute; sigma pre-activation: relative band
    assert np.max(np.abs(a[:3] - b[:3])) < 0.1
    sd = np.std(a[3]) + 1e-6
    assert np.max(np.abs(a[3] - b[3])) / sd < 0.5


def test_render_rays_fused_int8_close_to_bf16(setup):
    """render_rays_fused with an int8 pack ≈ with the bf16 pack — exercises
    the _kernels_for layout dispatch (render/fused.py) AND fused_sigma_t_int8
    end-to-end through the coarse->pdf->fine pipeline (ADVICE r3: neither was
    covered; only fused_full_t_int8 had a kernel-level test)."""
    from nerf_siren_tpu.config import RenderConfig
    from nerf_siren_tpu.render.fused import render_rays_fused

    cfg, params, scales, packed_field = setup
    packed_i8 = {"coarse": packed_field, "fine": packed_field}
    packed_bf = {"coarse": fused_mlp.pack_nerf_params(params, cfg),
                 "fine": fused_mlp.pack_nerf_params(params, cfg)}

    r = 16
    key = jax.random.PRNGKey(9)
    o = jax.random.uniform(key, (r, 3), minval=-0.3, maxval=0.3)
    d = jax.random.normal(jax.random.PRNGKey(10), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((r, 1), 0.5), jnp.full((r, 1), 2.0)], axis=-1)
    rcfg = RenderConfig(n_samples=16, n_importance=8, perturb=0.0,
                        noise_std=0.0, white_back=True, test_time=True)

    out_bf = render_rays_fused(packed_bf, rays, rcfg, nerf_cfg=cfg)
    out_i8 = render_rays_fused(packed_i8, rays, rcfg, nerf_cfg=cfg)
    # random weights give a diffuse field; fake-quant noise stays small
    # after compositing (rgb in [0, 1])
    assert np.max(np.abs(np.asarray(out_bf["rgb_fine"])
                         - np.asarray(out_i8["rgb_fine"]))) < 0.15
    assert np.all(np.isfinite(np.asarray(out_i8["depth_fine"])))
