"""Embedding and NeRF MLP unit tests."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.models.embedding import positional_encoding, embedding_out_channels
from nerf_siren_tpu.models.nerf import init_nerf, apply_nerf


def oracle_embedding(x, n_freqs, logscale=True):
    """Literal per-frequency loop matching reference models/nerf.py:33-38."""
    if logscale:
        freqs = 2.0 ** np.linspace(0, n_freqs - 1, n_freqs)
    else:
        freqs = np.linspace(1, 2 ** (n_freqs - 1), n_freqs)
    out = [x]
    for f in freqs:
        out.append(np.sin(f * x))
        out.append(np.cos(f * x))
    return np.concatenate(out, -1)


def test_embedding_matches_oracle(rng):
    x = rng.standard_normal((17, 3)).astype(np.float32)
    for n_freqs, logscale in [(10, True), (4, True), (6, False)]:
        got = np.asarray(positional_encoding(jnp.asarray(x), n_freqs, logscale))
        expected = oracle_embedding(x, n_freqs, logscale)
        assert got.shape[-1] == embedding_out_channels(3, n_freqs)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_embedding_leading_dims(rng):
    x = rng.standard_normal((4, 7, 3)).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), 4))
    expected = oracle_embedding(x, 4)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_nerf_shapes_and_sigma_consistency():
    cfg = NeRFConfig()
    params = init_nerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, cfg.in_channels_xyz))
    d = jax.random.normal(jax.random.PRNGKey(2), (32, cfg.in_channels_dir))

    sigma_only = apply_nerf(params, x, None, cfg=cfg)
    full = apply_nerf(params, x, d, cfg=cfg)
    assert sigma_only.shape == (32, 1)
    assert full.shape == (32, 4)
    # the sigma head must not depend on direction
    np.testing.assert_allclose(np.asarray(full[:, 3:4]), np.asarray(sigma_only), rtol=1e-6)
    # rgb is sigmoid'ed
    assert np.asarray(full[:, :3]).min() >= 0 and np.asarray(full[:, :3]).max() <= 1


def test_nerf_semantic_head():
    cfg = NeRFConfig(n_classes=6)
    params = init_nerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.in_channels_xyz))
    d = jax.random.normal(jax.random.PRNGKey(2), (8, cfg.in_channels_dir))
    out = apply_nerf(params, x, d, cfg=cfg)
    assert out.shape == (8, 4 + 6)
    cls = np.asarray(out[:, 4:])
    assert cls.min() >= 0 and cls.max() <= 1  # sigmoid head


def test_nerf_init_distribution():
    # torch-default Linear init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    cfg = NeRFConfig()
    params = init_nerf(jax.random.PRNGKey(0), cfg)
    w = np.asarray(params["xyz_layers"][1]["kernel"])
    bound = 1.0 / np.sqrt(cfg.width)
    assert np.abs(w).max() <= bound + 1e-6
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range
