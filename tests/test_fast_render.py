"""Proxy-culled fast renderer: distillation converges and the fast render
matches the exact renderer on a trained scene."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.models.nerf import apply_nerf
from nerf_siren_tpu.render.fast import (
    apply_proxy,
    distill_proxy,
    init_proxy,
    render_rays_fast,
)
from nerf_siren_tpu.render.rendering import render_rays
from nerf_siren_tpu.training.metrics import psnr
from nerf_siren_tpu.training.system import NeRFSystem, epoch_iterator


def _train_scene():
    """Multi-view training (8 orbit cameras) so the field has clean empty
    space — culling is meaningless on single-view foggy fields."""
    from tests.datasets_synthetic import make_blender_dataset
    import tempfile
    from nerf_siren_tpu.datasets.blender import BlenderDataset

    root = make_blender_dataset(tempfile.mkdtemp(), n_train=8, hw=40)
    ds = BlenderDataset(root, "train", img_wh=(40, 40))

    render_cfg = RenderConfig(n_samples=32, perturb=1.0, noise_std=1.0, white_back=True)
    nerf_cfg = NeRFConfig(depth=4, width=64)
    system = NeRFSystem(render_cfg, TrainConfig(lr=1e-3, decay_step=(100,)),
                        nerf_cfg, steps_per_epoch=12)
    state = system.init_state(jax.random.PRNGKey(0))
    for epoch in range(16):
        for batch in epoch_iterator(ds.all_rays, ds.all_rgbs, 1024, seed=0, epoch=epoch):
            state, m = system.train_step(state, batch, jax.random.PRNGKey(1))
    return state.params, nerf_cfg, ds.all_rays, ds.all_rgbs, float(m["train/psnr"])


def test_fast_render_matches_exact():
    params, nerf_cfg, rays, rgbs, train_psnr = _train_scene()
    assert train_psnr > 17, f"scene undertrained: {train_psnr}"

    def sigma_fn(pts):
        emb = positional_encoding(pts, 10)
        return apply_nerf(params["coarse"], emb, None, cfg=nerf_cfg)[:, 0]

    proxy = distill_proxy(sigma_fn, [-2, -2, -2], [2, 2, 2],
                          jax.random.PRNGKey(5), steps=200, batch=16384)

    # proxy ranks occupied vs empty space correctly
    inside = apply_proxy(proxy, jnp.asarray([[0.0, 0.0, 0.0]]), None)
    outside = apply_proxy(proxy, jnp.asarray([[1.9, 1.9, 1.9]]), None)
    assert float(inside[0]) > float(outside[0])

    eval_rays = jnp.asarray(rays[:1600])
    gt = jnp.asarray(rgbs[:1600])
    exact_cfg = RenderConfig(n_samples=64, n_importance=0, perturb=0.0,
                             noise_std=0.0, white_back=True)
    exact = render_rays({"coarse": params["coarse"]}, eval_rays, exact_cfg,
                        None, nerf_cfg=nerf_cfg)
    fast = render_rays_fast(params, proxy, eval_rays, n_candidates=96,
                            n_keep=24, nerf_cfg=nerf_cfg, model="coarse",
                            white_back=True, compute_dtype=None)

    psnr_exact = float(psnr(exact["rgb_coarse"], gt))
    psnr_fast = float(psnr(fast["rgb_coarse"], gt))
    # the culled render must stay within ~1 dB of the exact render
    assert psnr_fast > psnr_exact - 1.0, (
        f"fast {psnr_fast:.2f} vs exact {psnr_exact:.2f}")
    # and agree pixelwise
    agreement = float(psnr(fast["rgb_coarse"], exact["rgb_coarse"]))
    assert agreement > 25, f"fast/exact divergence: {agreement:.2f} dB"


def test_proxy_select_kernel_matches_jnp(rng):
    """The pallas proxy_select kernel must select exactly the same depths as
    the bf16 jnp path (set equality per ray; tie order may differ)."""
    import jax.numpy as jnp
    from nerf_siren_tpu.ops.pallas.proxy_select import (
        pack_proxy_params, proxy_select)

    proxy = init_proxy(jax.random.PRNGKey(1))
    packed = pack_proxy_params(proxy)
    n = 70  # non-multiple of the ray tile
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [rng.normal(size=(n, 3)).astype(np.float32) * 0.2, d,
         np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))

    nc, nk = 32, 8
    t = jnp.linspace(0, 1, nc)
    z = rays[:, 6:7] * (1 - t) + rays[:, 7:8] * t
    xyz = rays[:, None, 0:3] + rays[:, None, 3:6] * z[..., None]
    scores = apply_proxy(proxy, xyz, jnp.bfloat16)
    _, idx = jax.lax.top_k(scores, nk)
    z_ref = np.sort(np.asarray(jnp.take_along_axis(z, idx, -1)), -1)

    z_got = np.sort(np.asarray(proxy_select(packed, rays, nc, nk)), -1)
    np.testing.assert_allclose(z_got, z_ref, atol=1e-5)


def test_fast_render_with_scene_aabb():
    """AABB-tightened candidate range keeps agreement with the exact render
    at far fewer candidates (the bench configuration)."""
    params, nerf_cfg, rays, rgbs, train_psnr = _train_scene()

    def sigma_fn(pts):
        emb = positional_encoding(pts, 10)
        return apply_nerf(params["coarse"], emb, None, cfg=nerf_cfg)[:, 0]

    proxy = distill_proxy(sigma_fn, [-2, -2, -2], [2, 2, 2],
                          jax.random.PRNGKey(5), steps=200, batch=16384)
    eval_rays = jnp.asarray(rays[:1600])
    exact_cfg = RenderConfig(n_samples=64, n_importance=0, perturb=0.0,
                             noise_std=0.0, white_back=True)
    exact = render_rays({"coarse": params["coarse"]}, eval_rays, exact_cfg,
                        None, nerf_cfg=nerf_cfg)
    fast = render_rays_fast(params, proxy, eval_rays, n_candidates=32,
                            n_keep=12, nerf_cfg=nerf_cfg, model="coarse",
                            white_back=True, compute_dtype=None,
                            scene_aabb=([-1.3, -1.3, -1.3], [1.3, 1.3, 1.3]))
    agreement = float(psnr(fast["rgb_coarse"], exact["rgb_coarse"]))
    assert agreement > 25, f"aabb fast/exact divergence: {agreement:.2f} dB"


def test_fast_render_fused_matches_jnp_branch():
    """packed_params switches only the full-model evaluation backend; with an
    identical proxy/selection the fused branch must match the jnp branch."""
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.ops.pallas import fused_mlp

    old = fused_mlp.TILE_N
    fused_mlp.TILE_N = 128  # interpreter-mode speed
    try:
        cfg = NeRFConfig()  # kernel requires the full 8x256 topology
        params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
        packed = fused_mlp.pack_model_params(params, cfg)
        proxy = init_proxy(jax.random.PRNGKey(1))

        rng = np.random.default_rng(0)
        n = 24
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate(
            [rng.normal(size=(n, 3)).astype(np.float32) * 0.1, d,
             np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))

        kw = dict(n_candidates=32, n_keep=8, nerf_cfg=cfg, white_back=True,
                  scene_aabb=([-2] * 3, [2] * 3), select="pdf")
        ref = render_rays_fast(params, proxy, rays, **kw)
        got = render_rays_fast(params, proxy, rays, packed_params=packed, **kw)
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                       atol=1e-2, rtol=2e-2, err_msg=k)
    finally:
        fused_mlp.TILE_N = old


def test_fast_render_int8_pack_dispatch():
    """An int8 pack (pack_model_params_int8) routes the survivor eval
    through the int8 kernel and stays close to the bf16-pack render —
    the quantization noise bound on random weights; trained-scene quality
    is measured on-chip by tools/fast_frontier.py --int8_only."""
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.ops.pallas import fused_mlp, fused_mlp_int8
    from nerf_siren_tpu.render.fast import _field_kernel_for

    old = fused_mlp.TILE_N
    fused_mlp.TILE_N = 128
    try:
        cfg = NeRFConfig()
        params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
        packed = fused_mlp.pack_model_params(params, cfg)
        packed8 = fused_mlp_int8.pack_model_params_int8(params, cfg)
        assert (_field_kernel_for(packed8["fine"]).__name__
                == "fused_full_t_int8")
        assert _field_kernel_for(packed["fine"]).__name__ == "fused_full_t"
        proxy = init_proxy(jax.random.PRNGKey(1))

        rng = np.random.default_rng(0)
        n = 24
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(np.concatenate(
            [rng.normal(size=(n, 3)).astype(np.float32) * 0.1, d,
             np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))

        kw = dict(n_candidates=32, n_keep=8, nerf_cfg=cfg, white_back=True,
                  scene_aabb=([-2] * 3, [2] * 3), select="pdf")
        a = render_rays_fast(params, proxy, rays, packed_params=packed, **kw)
        b = render_rays_fast(params, proxy, rays, packed_params=packed8, **kw)
        # same selection, same compositing; only the trunk is quantized
        np.testing.assert_allclose(np.asarray(b["rgb_fine"]),
                                   np.asarray(a["rgb_fine"]), atol=0.1)
    finally:
        fused_mlp.TILE_N = old


def test_distill_overpredict_weight_suppresses_phantoms():
    """The asymmetric distillation loss must cut proxy overprediction in
    empty space (the failure mode that silently breaks expected-weight
    culling) without losing the occupied-region signal."""
    def sigma_fn(pts):  # a dense ball at the origin, empty elsewhere
        r2 = jnp.sum(pts ** 2, -1)
        return jnp.where(r2 < 0.25, 50.0, 0.0)

    kw = dict(steps=150, batch=4096, hidden=32)
    p_sym = distill_proxy(sigma_fn, [-2] * 3, [2] * 3, jax.random.PRNGKey(0),
                          overpredict_weight=1.0, **kw)
    p_asym = distill_proxy(sigma_fn, [-2] * 3, [2] * 3, jax.random.PRNGKey(0),
                           overpredict_weight=16.0, **kw)

    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (8192, 3)).astype(np.float32)
    empty = jnp.asarray(pts[np.sum(pts ** 2, -1) > 0.5])
    phantom_sym = float(jnp.percentile(apply_proxy(p_sym, empty, None), 99))
    phantom_asym = float(jnp.percentile(apply_proxy(p_asym, empty, None), 99))
    assert phantom_asym < phantom_sym, (phantom_asym, phantom_sym)

    inside = float(jnp.mean(apply_proxy(
        p_asym, jnp.asarray(rng.uniform(-0.3, 0.3, (512, 3)).astype(np.float32)),
        None)))
    assert inside > 1.0, f"occupied signal lost: {inside}"  # log1p(50) ~ 3.9
