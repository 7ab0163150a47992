"""SIREN/FiLM NeRF tests: init distributions, forward contract, trainability
inside render_rays."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import RenderConfig
from nerf_siren_tpu.models.siren import (
    apply_film,
    apply_mapping,
    apply_siren_nerf,
    init_siren_nerf,
    make_siren_field_fn,
)
from nerf_siren_tpu.render.rendering import render_rays


def test_siren_init_bounds():
    p = init_siren_nerf(jax.random.PRNGKey(0))
    # first layer: U(±1/3)
    w0 = np.asarray(p["network"][0]["kernel"])
    assert np.abs(w0).max() <= 1 / 3 + 1e-6
    # hidden layers: frequency_init(25) → U(±sqrt(6/256)/25)
    w1 = np.asarray(p["network"][1]["kernel"])
    bound = np.sqrt(6 / 256) / 25
    assert np.abs(w1).max() <= bound + 1e-7
    assert np.abs(w1).max() > 0.5 * bound


def test_film_layer():
    key = jax.random.PRNGKey(0)
    layer = {"kernel": jax.random.normal(key, (4, 8)), "bias": jnp.zeros(8)}
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    freq = jnp.full((1, 8), 2.0)
    phase = jnp.zeros((1, 8))
    out = apply_film(layer, x, freq, phase)
    np.testing.assert_allclose(np.asarray(out), np.sin(2 * np.asarray(x @ layer["kernel"])),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_mapping_shapes():
    p = init_siren_nerf(jax.random.PRNGKey(0), hidden_dim=64, n_layers=4, z_dim=32)
    f, ph = apply_mapping(p, jnp.ones((1, 32)))
    assert f.shape == (1, 5 * 64) and ph.shape == (1, 5 * 64)


def test_siren_forward_contract():
    p = init_siren_nerf(jax.random.PRNGKey(0), hidden_dim=64, n_layers=4, z_dim=32)
    xyz = jax.random.normal(jax.random.PRNGKey(1), (10, 7, 3)) * 5
    dirs = jax.random.normal(jax.random.PRNGKey(2), (10, 7, 3))
    out = apply_siren_nerf(p, xyz, dirs, hidden_dim=64)
    assert out.shape == (10, 7, 4)
    rgb = np.asarray(out[..., :3])
    assert rgb.min() >= 0 and rgb.max() <= 1
    assert np.isfinite(np.asarray(out)).all()


def test_siren_trains_in_render_rays(rng):
    p = init_siren_nerf(jax.random.PRNGKey(0), hidden_dim=64, n_layers=3, z_dim=16)
    n = 64
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cfg = RenderConfig(n_samples=16, noise_std=0.0, white_back=True)
    field_fn = make_siren_field_fn(rays[:, 3:6], hidden_dim=64)

    def loss(params):
        out = render_rays({"coarse": params}, rays, cfg, None, field_fn=field_fn)
        return jnp.mean((out["rgb_coarse"] - target) ** 2)

    import optax
    tx = optax.adam(1e-3)
    state = tx.init(p)
    l0 = float(loss(p))
    for _ in range(30):
        g = jax.grad(loss)(p)
        updates, state = tx.update(g, state)
        p = optax.apply_updates(p, updates)
    l1 = float(loss(p))
    assert np.isfinite(l1)
    assert l1 < l0, f"SIREN did not train: {l0} -> {l1}"
    # the learnable z receives gradient through the mapping network
    gz = jax.grad(loss)(p)["z"]
    assert float(jnp.abs(gz).sum()) > 0


def test_siren_system_with_cls_head_on_replica(rng):
    """BASELINE config 4: SIREN-activation NeRF + semantic nerf_cls head on
    Replica-format data."""
    from nerf_siren_tpu.config import NeRFConfig, TrainConfig
    from nerf_siren_tpu.training.system import NeRFSystem
    from nerf_siren_tpu.datasets import dataset_dict
    from tests.datasets_synthetic import make_replica_dataset
    import tempfile

    root = make_replica_dataset(tempfile.mkdtemp(), n_frames=6, hw=(20, 16))
    ds = dataset_dict["replica"](root, "train", img_wh=(20, 16),
                                 total_num=6, step=2)
    # replica classes in the fixture are {0,1,2}
    system = NeRFSystem(
        RenderConfig(n_samples=16, perturb=1.0, noise_std=1.0),
        TrainConfig(lr=1e-3, loss_type="msece", decay_step=(100,)),
        NeRFConfig(n_classes=3),
        steps_per_epoch=4,
        field_type="siren", siren_hidden=64, siren_layers=3, siren_z_dim=16)

    state = system.init_state(jax.random.PRNGKey(0))
    assert "parse" in state.params["coarse"]        # cls head exists
    assert "network" in state.params["coarse"]      # FiLM trunk

    batch = {"rays": ds.all_rays[:320], "rgbs": ds.all_rgbs[:320],
             "cls": ds.all_cls[:320]}
    losses = []
    for _ in range(4):
        state, m = system.train_step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["train/loss"]))
    assert np.isfinite(losses).all()

    out = system.render(state.params, ds.all_rays[:64])
    assert out["cls_coarse"].shape == (64, 3)
    assert out["rgb_coarse"].shape == (64, 3)
    assert np.isfinite(out["cls_coarse"]).all()
