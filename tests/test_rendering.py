"""Volume rendering core tests: compositing oracle, closed-form fields,
output-dict parity, and chunked==unchunked."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.render.rendering import (
    composite,
    render_rays,
    render_rays_chunked,
    stratified_z_vals,
)


def oracle_composite(sigmas, z_vals, dir_norm, rgbs):
    """Literal recurrence of reference models/rendering.py:162-190 in numpy."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = np.concatenate([deltas, 1e10 * np.ones_like(deltas[:, :1])], -1)
    deltas = deltas * dir_norm
    alphas = 1 - np.exp(-deltas * np.maximum(sigmas, 0))
    shifted = np.concatenate([np.ones_like(alphas[:, :1]), 1 - alphas + 1e-10], -1)
    weights = alphas * np.cumprod(shifted, -1)[:, :-1]
    rgb = (weights[..., None] * rgbs).sum(-2)
    depth = (weights * z_vals).sum(-1)
    return weights, rgb, depth


def test_composite_matches_oracle(rng):
    R, S = 13, 64
    z = np.sort(rng.uniform(2, 6, (R, S)).astype(np.float32), -1)
    sig = rng.standard_normal((R, S)).astype(np.float32) * 2
    rgbs = rng.uniform(0, 1, (R, S, 3)).astype(np.float32)
    dn = rng.uniform(0.5, 2.0, (R, 1)).astype(np.float32)

    out = composite(jnp.asarray(sig), jnp.asarray(z), jnp.asarray(dn), jnp.asarray(rgbs))
    w_e, rgb_e, d_e = oracle_composite(sig, z, dn, rgbs)
    np.testing.assert_allclose(np.asarray(out["weights"]), w_e, rtol=3e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_e, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), d_e, rtol=1e-4, atol=1e-4)


def test_composite_constant_sigma_closed_form():
    # constant sigma, unit direction: opacity of first S-1 intervals is
    # 1 - exp(-sigma * (z_last - z_0)); the final 1e10 delta absorbs the rest,
    # so total opacity ~= 1.
    R, S = 4, 128
    z = np.broadcast_to(np.linspace(2, 6, S, dtype=np.float32), (R, S)).copy()
    sigma_val = 0.7
    sig = np.full((R, S), sigma_val, np.float32)
    dn = np.ones((R, 1), np.float32)
    out = composite(jnp.asarray(sig), jnp.asarray(z), jnp.asarray(dn))
    np.testing.assert_allclose(np.asarray(out["opacity"]), 1.0, atol=1e-5)
    # transmittance after the real intervals matches exp(-sigma*(far-near))
    w = np.asarray(out["weights"])
    trans_end = 1.0 - w[:, :-1].sum(-1)
    np.testing.assert_allclose(trans_end, np.exp(-sigma_val * 4.0), rtol=1e-2)


def test_stratified_z_vals_bounds_and_disp():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = np.asarray(stratified_z_vals(near, far, 64))
    assert np.allclose(z[:, 0], 2.0) and np.allclose(z[:, -1], 6.0)
    assert np.all(np.diff(z, axis=-1) > 0)

    zd = np.asarray(stratified_z_vals(near, far, 64, use_disp=True))
    assert np.allclose(zd[:, 0], 2.0) and np.allclose(zd[:, -1], 6.0)
    # disparity sampling concentrates samples near the camera
    assert np.median(zd) < np.median(z)

    key = jax.random.PRNGKey(0)
    zp = np.asarray(stratified_z_vals(near, far, 64, perturb=1.0, rng=key))
    assert np.all(np.diff(zp, axis=-1) > 0)
    assert zp.min() >= 2.0 - 1e-5 and zp.max() <= 6.0 + 1e-5


def _make_params(n_importance):
    key = jax.random.PRNGKey(0)
    p = {"coarse": init_nerf(key)}
    if n_importance > 0:
        p["fine"] = init_nerf(jax.random.PRNGKey(1))
    return p


def _make_rays(n, rng):
    o = rng.standard_normal((n, 3)).astype(np.float32) * 0.1
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 2.0, np.float32)
    far = np.full((n, 1), 6.0, np.float32)
    return jnp.asarray(np.concatenate([o, d, near, far], -1))


def test_render_rays_output_contract(rng):
    rays = _make_rays(16, rng)

    cfg = RenderConfig(n_samples=32, n_importance=0, noise_std=0.0)
    out = render_rays(_make_params(0), rays, cfg)
    assert set(out.keys()) == {"rgb_coarse", "depth_coarse", "opacity_coarse"}
    assert out["rgb_coarse"].shape == (16, 3)

    cfg = cfg.replace(n_importance=16)
    out = render_rays(_make_params(16), rays, cfg)
    assert set(out.keys()) == {
        "rgb_coarse", "depth_coarse", "opacity_coarse",
        "rgb_fine", "depth_fine", "opacity_fine",
    }

    cfg = cfg.replace(test_time=True)
    out = render_rays(_make_params(16), rays, cfg)
    assert set(out.keys()) == {"opacity_coarse", "rgb_fine", "depth_fine", "opacity_fine"}


def test_render_rays_white_back(rng):
    # a field with ~zero sigma must composite to (almost) pure white
    rays = _make_rays(8, rng)
    params = _make_params(0)

    def empty_field(p, xyz, d_emb):
        shape = xyz.shape[:-1]
        rgb = jnp.zeros((*shape, 3))
        sigma = jnp.full((*shape, 1), -100.0)  # relu(sigma) == 0
        return jnp.concatenate([rgb, sigma], -1)

    cfg = RenderConfig(n_samples=32, noise_std=0.0, white_back=True)
    out = render_rays(params, rays, cfg, field_fn=empty_field)
    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["opacity_coarse"]), 0.0, atol=1e-6)


def test_render_chunked_matches_unchunked(rng):
    rays = _make_rays(100, rng)  # deliberately not a multiple of chunk
    params = _make_params(8)
    cfg = RenderConfig(n_samples=16, n_importance=8, noise_std=0.0, chunk=32)
    full = render_rays(params, rays, cfg)
    tiled = render_rays_chunked(params, rays, cfg)
    for k in full:
        np.testing.assert_allclose(np.asarray(tiled[k]), np.asarray(full[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_render_rays_jit_and_grad(rng):
    rays = _make_rays(32, rng)
    params = _make_params(8)
    cfg = RenderConfig(n_samples=16, n_importance=8, perturb=1.0, noise_std=1.0)

    @jax.jit
    def loss_fn(p, key):
        out = render_rays(p, rays, cfg, key)
        return jnp.mean(out["rgb_fine"] ** 2) + jnp.mean(out["rgb_coarse"] ** 2)

    g = jax.grad(loss_fn)(params, jax.random.PRNGKey(3))
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # coarse grads exist (coarse loss) and fine grads exist
    assert np.abs(np.asarray(g["fine"]["xyz_layers"][0]["kernel"])).sum() > 0
    assert np.abs(np.asarray(g["coarse"]["xyz_layers"][0]["kernel"])).sum() > 0
