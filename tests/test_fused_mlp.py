"""Fused Pallas MLP kernel vs the jnp reference path (bit-match policy of
SURVEY §7: every kernel must match its jnp reference implementation).

On CPU these run through the Pallas interpreter — small sizes only.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.models.nerf import apply_nerf, init_nerf
from nerf_siren_tpu.ops.pallas import fused_mlp


@pytest.fixture(scope="module", autouse=True)
def small_tile():
    old = fused_mlp.TILE_N
    fused_mlp.TILE_N = 128  # keep interpreter-mode tests fast
    yield
    fused_mlp.TILE_N = old


@pytest.fixture(scope="module")
def setup():
    cfg = NeRFConfig()
    params = init_nerf(jax.random.PRNGKey(0), cfg)
    packed = fused_mlp.pack_nerf_params(params, cfg)
    return cfg, params, packed


def test_sigma_matches_jnp(setup):
    cfg, params, packed = setup
    xyz = jax.random.normal(jax.random.PRNGKey(1), (200, 3))  # non-multiple of tile
    ref = apply_nerf(params, positional_encoding(xyz, 10), None,
                     cfg=cfg, compute_dtype=jnp.bfloat16)
    got = fused_mlp.fused_nerf_sigma(packed, xyz)
    assert got.shape == (200, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-2)


def test_full_matches_jnp(setup):
    cfg, params, packed = setup
    xyz = jax.random.normal(jax.random.PRNGKey(1), (130, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (130, 3))
    ref = apply_nerf(params, positional_encoding(xyz, 10),
                     positional_encoding(dirs, 4), cfg=cfg, compute_dtype=jnp.bfloat16)
    got = fused_mlp.fused_nerf_full(packed, xyz, dirs)
    assert got.shape == (130, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-2)
    # rgb channel range respected
    assert np.asarray(got[:, :3]).min() >= 0 and np.asarray(got[:, :3]).max() <= 1


def test_render_rays_with_fused_field(setup):
    cfg, params, packed = setup
    from nerf_siren_tpu.render.rendering import render_rays

    rng = np.random.default_rng(0)
    n = 16
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))

    render_cfg = RenderConfig(n_samples=8, n_importance=8, noise_std=0.0, test_time=True)
    models = {"coarse": params, "fine": params}
    ref_out = render_rays(models, rays, render_cfg, None,
                          nerf_cfg=cfg, compute_dtype=jnp.bfloat16)

    packed_models = fused_mlp.pack_model_params(models, cfg)
    field_fn = fused_mlp.make_fused_field_fn(rays[:, 3:6], cfg)
    got_out = render_rays(packed_models, rays, render_cfg, None,
                          nerf_cfg=cfg, field_fn=field_fn)
    for k in ref_out:
        np.testing.assert_allclose(np.asarray(got_out[k]), np.asarray(ref_out[k]),
                                   atol=5e-3, rtol=2e-2, err_msg=k)


def test_render_rays_fused_matches_render_rays(setup):
    """The transposed production renderer must agree with the jnp-bf16
    render_rays on every output of the test_time contract."""
    cfg, params, packed = setup
    from nerf_siren_tpu.render.fused import render_rays_fused
    from nerf_siren_tpu.render.rendering import render_rays

    rng = np.random.default_rng(1)
    n = 24
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))

    render_cfg = RenderConfig(n_samples=8, n_importance=8, noise_std=0.0,
                              perturb=0.0, white_back=True, test_time=True)
    models = {"coarse": params, "fine": init_nerf(jax.random.PRNGKey(7), cfg)}
    ref_out = render_rays(models, rays, render_cfg, None,
                          nerf_cfg=cfg, compute_dtype=jnp.bfloat16)
    got_out = render_rays_fused(fused_mlp.pack_model_params(models, cfg),
                                rays, render_cfg, nerf_cfg=cfg)
    assert set(got_out) == {"opacity_coarse", "rgb_fine", "depth_fine",
                            "opacity_fine"}
    for k in got_out:
        np.testing.assert_allclose(np.asarray(got_out[k]), np.asarray(ref_out[k]),
                                   atol=5e-3, rtol=2e-2, err_msg=k)
