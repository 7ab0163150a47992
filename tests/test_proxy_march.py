"""Fused proxy-march kernel vs the jnp fast-renderer pdf path.

The kernel (ops/pallas/proxy_march.py) must reproduce render_rays_fast's
select='pdf' pipeline: same expected-weight math, same deterministic
inverse-CDF placement (reference sample_pdf semantics,
reference: models/rendering.py:22-67), same survivor coordinates. Runs in
Pallas interpret mode on CPU (the torchsearchsorted CPU-oracle pattern,
SURVEY.md §4); the same code path executes compiled on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.ops.pallas.fused_mlp import pack_model_params
from nerf_siren_tpu.ops.pallas.proxy_march import (
    TILE_R, pack_proxy_params, proxy_march_select)
from nerf_siren_tpu.ops.sample_pdf import sample_pdf
from nerf_siren_tpu.render.fast import (apply_proxy, init_proxy,
                                        render_rays_fast)

C, K = 16, 8


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    d = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 2.0, np.float32)
    far = np.full((n, 1), 6.0, np.float32)
    return jnp.asarray(np.concatenate([o, d, near, far], -1))


def _reference_z_sel(proxy, rays, midpoint=False):
    """The jnp pdf-selection pipeline exactly as render_rays_fast builds it."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = jnp.linspace(0.0, 1.0, C)
    z = near * (1 - t) + far * t
    spacing = (far - near) / (C - 1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    score = apply_proxy(proxy, xyz, jnp.bfloat16)
    sigma_hat = jnp.expm1(jax.nn.relu(score.astype(jnp.float32)))
    a_hat = 1.0 - jnp.exp(-sigma_hat * spacing * dir_norm)
    tr = jnp.cumprod(1.0 - a_hat + 1e-10, axis=-1)
    tr = jnp.concatenate([jnp.ones_like(tr[:, :1]), tr[:, :-1]], axis=-1)
    w_hat = a_hat * tr
    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
    return sample_pdf(z_mid, w_hat[:, 1:-1], K, rng=None, det=True,
                      midpoint=midpoint)


@pytest.fixture(scope="module")
def proxy():
    return init_proxy(jax.random.PRNGKey(3), hidden=96)


@pytest.mark.parametrize("midpoint", [False, True])
def test_selected_depths_match_jnp_pdf_path(proxy, midpoint):
    rays = _rays(TILE_R)
    z_ref = np.asarray(_reference_z_sel(proxy, rays, midpoint=midpoint))
    packed = pack_proxy_params(proxy)
    z_sel, xyzT, dirT = proxy_march_select(packed, rays.T, C, K,
                                           midpoint=midpoint)
    z_kernel = np.asarray(z_sel).T                        # (R, K)
    span = 4.0  # far - near
    # bf16 matmul-order deltas shift the CDF slightly; the inverse-CDF interp
    # is continuous, so depths must agree to a small fraction of the span.
    assert np.median(np.abs(z_kernel - z_ref)) < 0.005 * span
    assert np.percentile(np.abs(z_kernel - z_ref), 99) < 0.05 * span
    # ascending depths (u ascending through a monotone CDF)
    assert np.all(np.diff(z_kernel, axis=-1) >= -1e-5)


def test_survivor_coordinates_consistent(proxy):
    rays = _rays(TILE_R, seed=1)
    packed = pack_proxy_params(proxy)
    z_sel, xyzT, dirT = proxy_march_select(packed, rays.T, C, K)
    z = np.asarray(z_sel)                                 # (K, R)
    o = np.asarray(rays[:, 0:3]).T                        # (3, R)
    d = np.asarray(rays[:, 3:6]).T
    xyz = np.asarray(xyzT)
    dirs = np.asarray(dirT)
    for k in range(K):
        blk = xyz[:, k * TILE_R:(k + 1) * TILE_R]
        np.testing.assert_allclose(blk[:3], o + d * z[k], rtol=0, atol=1e-4)
        assert np.all(blk[3:] == 0.0)
        np.testing.assert_array_equal(
            dirs[:3, k * TILE_R:(k + 1) * TILE_R], d)


def test_adaptive_k_full_fraction_equals_plain_k_hi(proxy):
    """adaptive=(1.0, k_hi) re-renders EVERY ray at k_hi, so the scattered
    result must equal a plain run with n_keep=k_hi; and a partial fraction
    must leave the un-selected rays bit-identical to the base-K render."""
    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    rays = _rays(4 * TILE_R, seed=3)
    common = dict(n_candidates=C, nerf_cfg=cfg, white_back=True,
                  select="pdf", packed_params=packed_params,
                  packed_proxy=packed_proxy)

    plain_hi = render_rays_fast(params, proxy, rays, n_keep=16, **common)
    adapt_all = render_rays_fast(params, proxy, rays, n_keep=K,
                                 adaptive=(1.0, 16), **common)
    for key in ("rgb_fine", "depth_fine", "opacity_fine"):
        np.testing.assert_allclose(np.asarray(adapt_all[key]),
                                   np.asarray(plain_hi[key]),
                                   rtol=0, atol=1e-5)

    base = render_rays_fast(params, proxy, rays, n_keep=K, **common)
    adapt_part = render_rays_fast(params, proxy, rays, n_keep=K,
                                  adaptive=(0.25, 16), **common)
    rgb_b = np.asarray(base["rgb_fine"])
    rgb_a = np.asarray(adapt_part["rgb_fine"])
    changed = np.any(rgb_b != rgb_a, axis=-1)
    n_rays = rays.shape[0]
    # exactly one tile's worth of rays is re-rendered (0.25 * 4 tiles)
    assert changed.sum() <= TILE_R
    # the re-rendered rays must be the highest-ambiguity ones; everyone
    # else is untouched
    assert np.array_equal(rgb_b[~changed], rgb_a[~changed])


def test_proxy_opacity_matches_jnp_march(proxy):
    """The culling prepass kernel must reproduce 1 - final transmittance of
    the jnp candidate march (render_rays_fast's proxy_weights math)."""
    from nerf_siren_tpu.ops.pallas.proxy_march import proxy_opacity

    rays = _rays(TILE_R, seed=4)
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = jnp.linspace(0.0, 1.0, C)
    z = near * (1 - t) + far * t
    spacing = (far - near) / (C - 1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    score = apply_proxy(proxy, xyz, jnp.bfloat16)
    sigma_hat = jnp.expm1(jax.nn.relu(score.astype(jnp.float32)))
    a_hat = 1.0 - jnp.exp(-sigma_hat * spacing * dir_norm)
    opac_ref = 1.0 - jnp.prod(1.0 - a_hat + 1e-10, axis=-1)

    packed = pack_proxy_params(proxy)
    opac = np.asarray(proxy_opacity(packed, rays.T, C))
    err = np.abs(opac - np.asarray(opac_ref))
    assert np.median(err) < 2e-3
    assert err.max() < 0.05


def test_cull_full_fraction_equals_plain(proxy):
    """cull=1.0 runs every ray through the normal pipeline (permuted by the
    opacity sort, scattered back) — output must equal the plain fused render
    exactly; a partial fraction must leave the culled rays at background."""
    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    rays = _rays(2 * TILE_R, seed=5)
    common = dict(n_candidates=C, n_keep=K, nerf_cfg=cfg, white_back=True,
                  select="pdf", packed_params=packed_params,
                  packed_proxy=packed_proxy)

    plain = render_rays_fast(params, proxy, rays, **common)
    culled_all = render_rays_fast(params, proxy, rays, cull=1.0, **common)
    for key in ("rgb_fine", "depth_fine", "opacity_fine"):
        np.testing.assert_allclose(np.asarray(culled_all[key]),
                                   np.asarray(plain[key]), rtol=0, atol=1e-6)

    culled_half = render_rays_fast(params, proxy, rays, cull=0.5, **common)
    rgb = np.asarray(culled_half["rgb_fine"])
    opac = np.asarray(culled_half["opacity_fine"])
    is_bg = np.all(rgb == 1.0, axis=-1) & (opac == 0.0)
    # half the rays are culled to background (plus any active ray whose
    # field happens to be empty, which renders white either way)
    assert is_bg.sum() >= TILE_R
    # active rays match the plain render
    rgb_plain = np.asarray(plain["rgb_fine"])
    np.testing.assert_allclose(rgb[~is_bg], rgb_plain[~is_bg],
                               rtol=0, atol=1e-6)


def test_fused_fast_render_matches_jnp_fast_render(proxy):
    """End-to-end: render_rays_fast with packed_proxy vs the jnp pdf path."""
    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    rays = _rays(256, seed=2)

    base = render_rays_fast(params, proxy, rays, n_candidates=C, n_keep=K,
                            nerf_cfg=cfg, white_back=True, select="pdf",
                            packed_params=packed_params)
    fused = render_rays_fast(params, proxy, rays, n_candidates=C, n_keep=K,
                             nerf_cfg=cfg, white_back=True, select="pdf",
                             packed_params=packed_params,
                             packed_proxy=packed_proxy)
    for k in ("rgb_fine", "depth_fine", "opacity_fine"):
        a, b = np.asarray(base[k]), np.asarray(fused[k])
        assert a.shape == b.shape
        err = np.abs(a - b)
        scale = max(1.0, float(np.abs(a).max()))
        assert np.median(err) < 2e-3 * scale, (k, np.median(err))
        assert np.percentile(err, 99) < 0.05 * scale, (k, np.percentile(err, 99))


def test_auto_cull_renderer(proxy):
    """Frame-global auto culling with the temporal budget: the FIRST frame
    always renders every ray (must equal the plain fused render exactly,
    including on a ray count that is NOT a tile multiple); a huge margin
    keeps later frames full too; an impossible opacity_eps makes the
    second frame render only the minimum bucket, background elsewhere."""
    from nerf_siren_tpu.render.fast import make_auto_cull_renderer

    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    r = 2 * TILE_R + 513                     # exercises the padding path
    rays = _rays(r, seed=6)
    common = dict(n_candidates=C, n_keep=K, nerf_cfg=cfg, white_back=True,
                  packed_params=packed_params, packed_proxy=packed_proxy)

    plain = render_rays_fast(params, proxy, rays, select="pdf", **common)
    auto = make_auto_cull_renderer(params, proxy, margin=1e9, **common)
    for frame in range(2):                   # first = full by construction,
        out = auto(rays)                     # second = full via the margin
        for key in ("rgb_fine", "depth_fine", "opacity_fine"):
            assert out[key].shape == plain[key].shape
            np.testing.assert_allclose(np.asarray(out[key]),
                                       np.asarray(plain[key]),
                                       rtol=0, atol=1e-6, err_msg=f"frame {frame}")

    lean = make_auto_cull_renderer(params, proxy, opacity_eps=2.0, **common)
    assert lean.last_eps is None             # not rendered yet
    first = lean(rays)                       # full render, measures n_fg=0
    np.testing.assert_allclose(np.asarray(first["rgb_fine"]),
                               np.asarray(plain["rgb_fine"]), rtol=0, atol=1e-6)
    out2 = lean(rays)                        # budget = minimum bucket
    rgb = np.asarray(out2["rgb_fine"])
    opac = np.asarray(out2["opacity_fine"])
    is_bg = np.all(rgb == 1.0, axis=-1) & (opac == 0.0)
    # budget = one quantum (rp/levels); everything else is background
    assert is_bg.sum() >= r - (r // 8 + TILE_R)
    # the rays it did render are the top-opacity ones and match plain
    np.testing.assert_allclose(rgb[~is_bg],
                               np.asarray(plain["rgb_fine"])[~is_bg],
                               rtol=0, atol=1e-6)


def test_auto_cull_eps_self_calibration(proxy):
    """opacity_eps='auto' (the default): frame 1 renders everything with the
    cull-nothing fallback eps, then calibrates the threshold from the rays
    that rendered empty; later frames keep active rays identical to the
    plain render and report a clamped, finite eps."""
    from nerf_siren_tpu.render.fast import make_auto_cull_renderer

    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    r = 2 * TILE_R + 513
    rays = _rays(r, seed=6)
    common = dict(n_candidates=C, n_keep=K, nerf_cfg=cfg, white_back=True,
                  packed_params=packed_params, packed_proxy=packed_proxy)

    plain = render_rays_fast(params, proxy, rays, select="pdf", **common)
    auto = make_auto_cull_renderer(params, proxy, **common)  # eps="auto"
    first = auto(rays)                       # full render + calibration
    np.testing.assert_allclose(np.asarray(first["rgb_fine"]),
                               np.asarray(plain["rgb_fine"]),
                               rtol=0, atol=1e-6)
    eps1 = float(np.asarray(auto.last_eps).reshape(()))
    had_empty = bool(np.any(np.asarray(plain["opacity_fine"]) < 0.01))
    if had_empty:                            # calibrated within the clamp
        assert 1e-4 <= eps1 <= 0.95
    else:                                    # fallback preserved: cull nothing
        assert eps1 == 2.0
    for _ in range(2):                       # budget now sized by eps1
        out = auto(rays)
        rgb = np.asarray(out["rgb_fine"])
        opac = np.asarray(out["opacity_fine"])
        is_bg = np.all(rgb == 1.0, axis=-1) & (opac == 0.0)
        np.testing.assert_allclose(
            rgb[~is_bg], np.asarray(plain["rgb_fine"])[~is_bg],
            rtol=0, atol=1e-6)
        assert np.isfinite(float(np.asarray(auto.last_eps).reshape(())))


def test_auto_cull_no_empty_rays_keeps_cull_nothing(proxy):
    """Regression (round-3 review + two-sided calibration): on a frame with
    NO rendered-empty rays the calibrated eps must stay at or below the
    visible rays' prepass scores (never the old clip-after-fallback 0.95,
    which collapsed the next frame's budget to the minimum quantum), so the
    next frame still renders essentially everything."""
    from nerf_siren_tpu.render.fast import make_auto_cull_renderer

    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    # fully-opaque field: every sample's sigma is pushed far positive
    params["fine"]["sigma"]["bias"] = params["fine"]["sigma"]["bias"] + 50.0
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    rays = _rays(TILE_R + 1, seed=7)
    auto = make_auto_cull_renderer(
        params, proxy, n_candidates=C, n_keep=K, nerf_cfg=cfg,
        white_back=True, packed_params=packed_params,
        packed_proxy=packed_proxy)
    first = auto(rays)
    assert float(np.min(np.asarray(first["opacity_fine"]))) > 0.5, \
        "fixture must render zero empty rays"
    # eps calibrates from the VISIBLE side: at most 0.5% of visible rays
    # may score below it, so the budget keeps ~every block
    second = auto(rays)                             # budget from frame 1
    assert auto.last_active_frac >= 0.99            # ~nothing culled
    np.testing.assert_allclose(np.asarray(second["rgb_fine"]),
                               np.asarray(first["rgb_fine"]),
                               rtol=0, atol=1e-6)


def test_auto_cull_dense_frame_bypass(proxy):
    """Round-4 (VERDICT r3 item 4): on a dense frame the steady-state auto
    renderer must take the PLAIN path — no prepass/sort/reassembly — with
    output still identical to render_rays_fast, and must return to the
    culled program when the measured foreground collapses."""
    from nerf_siren_tpu.render.fast import make_auto_cull_renderer

    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    # fully-opaque field -> every block foreground -> act frac 1.0
    params["fine"]["sigma"]["bias"] = params["fine"]["sigma"]["bias"] + 50.0
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    r = TILE_R + 1
    rays = _rays(r, seed=7)
    common = dict(n_candidates=C, n_keep=K, nerf_cfg=cfg, white_back=True,
                  packed_params=packed_params, packed_proxy=packed_proxy)
    plain_ref = render_rays_fast(params, proxy, rays, select="pdf", **common)

    auto = make_auto_cull_renderer(params, proxy, **common)
    first = auto(rays)                        # full program (calibration)
    assert auto.last_plain is False
    second = auto(rays)                       # dense -> plain bypass
    assert auto.last_plain is True
    assert auto.last_active_frac == 1.0
    for key in ("rgb_fine", "depth_fine", "opacity_fine"):
        np.testing.assert_allclose(np.asarray(second[key]),
                                   np.asarray(plain_ref[key]),
                                   rtol=0, atol=1e-6)
    third = auto(rays)                        # field-vis estimate says stay
    assert auto.last_plain is True
    np.testing.assert_allclose(np.asarray(third["rgb_fine"]),
                               np.asarray(plain_ref["rgb_fine"]),
                               rtol=0, atol=1e-6)

    # plain-mode EXIT: a pose whose rays render (near-)empty drops the
    # field-visible estimate below PLAIN_EXIT -> the renderer schedules a
    # FULL culled re-probe (renders every block, zero quality risk) and
    # leaves plain mode
    rays_miss = np.asarray(rays).copy()
    rays_miss[:, 6] = 1.0                     # degenerate [near, far]:
    rays_miss[:, 7] = 1.0 + 1e-6              # delta~0 -> alpha~0 everywhere
    rays_miss = jnp.asarray(rays_miss)
    miss_plain = auto(rays_miss)              # still plain; detects sparse
    assert auto.last_plain is True
    probe = auto(rays_miss)                   # forced FULL culled re-probe
    assert auto.last_plain is False
    assert auto.last_active_frac == 1.0
    ref_miss = render_rays_fast(params, proxy, rays_miss, select="pdf",
                                **common)
    for out in (miss_plain, probe):
        np.testing.assert_allclose(np.asarray(out["rgb_fine"]),
                                   np.asarray(ref_miss["rgb_fine"]),
                                   rtol=0, atol=1e-6)

    # sparse scene: an impossible per-ray field (sigma pushed far negative)
    # must leave plain mode once the plain frame measures zero foreground
    params_sp = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    params_sp["fine"]["sigma"]["bias"] = (
        params_sp["fine"]["sigma"]["bias"] - 50.0)
    auto_sp = make_auto_cull_renderer(
        params_sp, proxy, opacity_eps=0.99, **{
            **common, "packed_params": pack_model_params(params_sp, cfg)})
    auto_sp(rays)                             # full frame: prepass n_fg ~ 0
    auto_sp(rays)                             # minimum-bucket culled frame
    assert auto_sp.last_plain is False
    assert auto_sp.last_active_frac < 0.65    # below PLAIN_EXIT: stays culled


def test_march_density_aux_matches_jnp(proxy):
    """proxy_march_select(return_density=True): aux rows 0..K-1 must match
    sample_pdf's normalized bin density and row K the placement CDF's
    unnormalized interior mass, computed from the same proxy march."""
    rays = _rays(TILE_R, seed=8)
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = jnp.linspace(0.0, 1.0, C)
    z = near * (1 - t) + far * t
    spacing = (far - near) / (C - 1)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    score = apply_proxy(proxy, xyz, jnp.bfloat16)
    sigma_hat = jnp.expm1(jax.nn.relu(score.astype(jnp.float32)))
    a_hat = 1.0 - jnp.exp(-sigma_hat * spacing * dir_norm)
    tr = jnp.cumprod(1.0 - a_hat + 1e-10, axis=-1)
    tr = jnp.concatenate([jnp.ones_like(tr[:, :1]), tr[:, :-1]], axis=-1)
    w_hat = a_hat * tr
    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
    _, rho_ref = sample_pdf(z_mid, w_hat[:, 1:-1], K, rng=None, det=True,
                            midpoint=True, return_density=True)
    w_ref = np.asarray(jnp.sum(w_hat[:, 1:-1] + 1e-5, axis=-1))

    packed = pack_proxy_params(proxy)
    out = proxy_march_select(packed, rays.T, C, K, midpoint=True,
                             return_density=True)
    assert len(out) == 4
    aux = np.asarray(out[3])
    rho_k = aux[:K].T                                  # (R, K)
    w_k = aux[K]                                       # (R,)
    # mass: bf16 matmul noise only
    rel_w = np.abs(w_k - w_ref) / np.maximum(w_ref, 1e-4)
    assert np.median(rel_w) < 0.05
    # density is piecewise-constant per bin — CDF noise near a bin edge
    # relocates a sample into the neighboring bin, so compare in bulk
    rho_ref = np.asarray(rho_ref)
    rel = np.abs(rho_k - rho_ref) / np.maximum(np.abs(rho_ref), 1e-3)
    assert np.median(rel) < 0.05
    assert np.mean(rel < 0.25) > 0.8


def test_fused_ratio_quadrature_matches_jnp_ratio(proxy):
    """quadrature='ratio' through the fused march kernel must agree with the
    jnp pdf path's ratio epilogue (same estimator, bf16 selection noise)."""
    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    packed_params = pack_model_params(params, cfg)
    packed_proxy = pack_proxy_params(proxy)
    rays = _rays(TILE_R, seed=9)
    kw = dict(n_candidates=C, n_keep=K, nerf_cfg=cfg, white_back=True,
              select="pdf", placement="mid", quadrature="ratio")
    ref = render_rays_fast(params, proxy, rays, **kw)
    got = render_rays_fast(params, proxy, rays, packed_params=packed_params,
                           packed_proxy=packed_proxy, **kw)
    for key in ("rgb_fine", "opacity_fine"):
        a, b = np.asarray(got[key]), np.asarray(ref[key])
        assert np.isfinite(a).all()
        assert np.median(np.abs(a - b)) < 5e-3, key
        assert np.mean(np.abs(a - b) < 0.05) > 0.95, key
    assert float(np.max(np.asarray(got["opacity_fine"]))) <= 1.0 + 1e-5
