"""StyleGAN2 network tests: FC layer parity vs torch formulas, mapping
network invariants, modulated conv demodulation, synthesis shapes."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from nerf_siren_tpu.models.stylegan2 import (  # noqa: E402
    GeneratorConfig,
    MappingConfig,
    SynthesisConfig,
    apply_fc,
    apply_generator,
    apply_mapping,
    apply_synthesis_network,
    init_fc,
    init_generator,
    init_mapping,
    modulated_conv2d,
    normalize_2nd_moment,
)
from nerf_siren_tpu.ops.upfirdn2d import setup_filter  # noqa: E402


def test_fc_layer_weight_gain(rng):
    # y = x @ (w * lr_mult/sqrt(in)).T + b*lr_mult, matching reference
    # networks_stylegan2.py:97-133
    p = init_fc(jax.random.PRNGKey(0), 16, 8, lr_multiplier=0.01, bias_init=1.0)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    got = np.asarray(apply_fc(p, x, lr_multiplier=0.01))
    w = np.asarray(p["weight"]) * (0.01 / np.sqrt(16))
    b = np.asarray(p["bias"]) * 0.01
    np.testing.assert_allclose(got, np.asarray(x) @ w.T + b, rtol=1e-5, atol=1e-6)
    # init: weight scaled by 1/lr_mult → std ~ 100
    assert 50 < np.asarray(p["weight"]).std() < 200
    assert np.allclose(np.asarray(p["bias"]), 1.0)


def test_normalize_2nd_moment():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64)).astype(np.float32))
    y = np.asarray(normalize_2nd_moment(x))
    np.testing.assert_allclose((y ** 2).mean(-1), 1.0, rtol=1e-4)


def test_mapping_network_contract():
    cfg = MappingConfig(z_dim=32, c_dim=0, w_dim=16, num_ws=5, num_layers=2)
    p = init_mapping(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
    ws = apply_mapping(p, cfg, z)
    assert ws.shape == (3, 5, 16)
    # broadcast: all num_ws slices identical
    np.testing.assert_allclose(np.asarray(ws[:, 0]), np.asarray(ws[:, 4]))
    # truncation toward w_avg (zeros at init) shrinks the magnitude
    ws_tr = apply_mapping(p, cfg, z, truncation_psi=0.5)
    assert float(jnp.abs(ws_tr).mean()) < float(jnp.abs(ws).mean())
    ws_0 = apply_mapping(p, cfg, z, truncation_psi=0.0)
    np.testing.assert_allclose(np.asarray(ws_0), 0.0, atol=1e-6)


def test_modulated_conv2d_demodulation(rng):
    """After demodulation, the effective per-output-channel weight norm is ~1,
    so unit-variance input stays ~unit variance."""
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((12, 8, 3, 3)).astype(np.float32))
    styles = jnp.asarray(rng.uniform(0.5, 2.0, (2, 8)).astype(np.float32))
    y = modulated_conv2d(x, w, styles, padding=1)
    assert y.shape == (2, 12, 16, 16)
    assert 0.5 < float(jnp.std(y)) < 2.0

    # demodulate=False scales with styles
    y1 = modulated_conv2d(x, w, styles, padding=1, demodulate=False)
    y2 = modulated_conv2d(x, w, styles * 2, padding=1, demodulate=False)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-4)


def test_synthesis_network_shapes():
    cfg = SynthesisConfig(w_dim=32, img_resolution=32, img_channels=6,
                          channel_base=1024, channel_max=64)
    params = {f"b{res}": None for res in cfg.block_resolutions}
    assert cfg.block_resolutions == (4, 8, 16, 32)
    # num_ws: 1 (b4 conv) + 2*3 (other blocks) + 1 (torgb) = 8
    assert cfg.num_ws == 8

    from nerf_siren_tpu.models.stylegan2 import init_synthesis_network
    p = init_synthesis_network(jax.random.PRNGKey(0), cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_ws, 32))
    img = apply_synthesis_network(p, cfg, ws)
    assert img.shape == (2, 6, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_generator_end_to_end():
    cfg = GeneratorConfig(z_dim=32, w_dim=32, img_resolution=16, img_channels=3,
                          mapping_layers=2, channel_base=512, channel_max=32)
    p = init_generator(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    img = apply_generator(p, cfg, z)
    assert img.shape == (2, 3, 16, 16)
    # different z → different images
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    img2 = apply_generator(p, cfg, z2)
    assert float(jnp.abs(img - img2).mean()) > 1e-4
    # random noise mode runs with an rng
    img3 = apply_generator(p, cfg, z, noise_mode="random", rng=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(img3)).all()
