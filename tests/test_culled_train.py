"""Proxy-culled training backend (render/culled_train.py).

The culled step replaces the reference's 64-sample coarse placement pass
(reference models/rendering.py:140-190) with an online-distilled proxy;
these tests pin the contract: the step trains, the proxy learns only from
its regression term (never from the photometric loss), the renderer output
dict feeds the unchanged loss registry, and the fused-kernel composition
('culled_fused') runs and matches the jnp culled step at mixed-precision
tolerance. Convergence parity vs the reference recipe is measured on-chip
by tools/fused_train_parity.py (docs/fused_train_parity.json).
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.training.system import NeRFSystem

SMALL = NeRFConfig(width=48, depth=2, skips=())


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([np.zeros((n, 3), np.float32), d,
                           np.full((n, 1), 2, np.float32),
                           np.full((n, 1), 6, np.float32)], -1)
    rgbs = (0.5 + 0.5 * np.tanh(d)).astype(np.float32)
    return {"rays": rays, "rgbs": rgbs}


def _mk(backend, nerf_cfg=SMALL, **kw):
    sys_ = NeRFSystem(
        RenderConfig(n_samples=16, n_importance=16, perturb=1.0,
                     noise_std=0.0, white_back=True),
        TrainConfig(lr=5e-3, batch_size=128, decay_step=(100,)),
        nerf_cfg, steps_per_epoch=16, train_backend=backend,
        culled_candidates=16, culled_sel=8, culled_uni=4, **kw)
    return sys_, sys_.init_state(jax.random.PRNGKey(0))


def test_culled_backend_trains_and_proxy_learns():
    batch = _rays(128)
    sys_, state = _mk("culled")
    assert "proxy" in jax.device_get(state.params)
    key = jax.random.PRNGKey(1)
    losses, proxy_losses = [], []
    for _ in range(40):
        state, m = sys_.train_step(state, batch, key)
        losses.append(float(m["train/loss"]))
        proxy_losses.append(float(m["train/proxy_loss"]))
    assert np.isfinite(losses).all() and np.isfinite(proxy_losses).all()
    assert losses[-1] < losses[0], f"culled backend did not train: {losses}"
    # the online regression tracks the (moving) field: it must end far
    # below its random-proxy start even though the target itself drifts
    assert proxy_losses[-1] < 0.5 * proxy_losses[0], proxy_losses

    # composes with the scanned trainer
    state, m = sys_.train_scan(state, batch["rays"], batch["rgbs"],
                               jax.random.PRNGKey(2), 4)
    assert np.isfinite(float(m["train/loss"]))


def test_photometric_loss_never_moves_the_proxy():
    """Selection is detached (like the reference's sample_pdf z-values): with
    the regression term weighted to zero, a step must leave the proxy
    bit-identical while the field still updates."""
    batch = _rays(128, seed=3)
    sys_, state = _mk("culled", proxy_lambda=0.0)
    p0 = jax.device_get(state.params)
    state, _ = sys_.train_step(state, batch, jax.random.PRNGKey(4))
    p1 = jax.device_get(state.params)
    for leaf0, leaf1 in zip(jax.tree_util.tree_leaves(p0["proxy"]),
                            jax.tree_util.tree_leaves(p1["proxy"])):
        np.testing.assert_array_equal(leaf0, leaf1)
    moved = max(float(np.max(np.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(p0["fine"]),
        jax.tree_util.tree_leaves(p1["fine"])))
    assert moved > 0.0


def test_culled_renderer_output_contract():
    from nerf_siren_tpu.render.culled_train import render_rays_culled

    batch = _rays(64, seed=5)
    sys_, state = _mk("culled")
    params = jax.device_get(state.params)
    out, p_loss = render_rays_culled(
        params, jnp.asarray(batch["rays"]),
        RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                     noise_std=0.0, white_back=True),
        jax.random.PRNGKey(0), nerf_cfg=SMALL,
        n_candidates=16, n_sel=8, n_uni=4)
    for k in ("rgb_coarse", "depth_coarse", "opacity_coarse",
              "rgb_fine", "depth_fine", "opacity_fine"):
        assert k in out, k
    assert out["rgb_fine"].shape == (64, 3)
    assert np.isfinite(float(p_loss))
    # depths live inside the ray bounds
    assert float(jnp.min(out["depth_fine"])) >= 0.0
    assert float(jnp.max(out["depth_fine"])) <= 6.0 + 1e-3
    # deterministic under perturb=0 + same key
    out2, _ = render_rays_culled(
        params, jnp.asarray(batch["rays"]),
        RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                     noise_std=0.0, white_back=True),
        jax.random.PRNGKey(0), nerf_cfg=SMALL,
        n_candidates=16, n_sel=8, n_uni=4)
    np.testing.assert_array_equal(np.asarray(out["rgb_fine"]),
                                  np.asarray(out2["rgb_fine"]))


def test_culled_fused_backend_matches_culled_jnp():
    """'culled_fused' (fused Pallas kernels at the culled samples) steps and
    its first-step loss matches 'culled' to bf16 tolerance on the same
    batch (reference 8x256 topology — the kernel's contract)."""
    batch = _rays(64, seed=7)

    def mk(backend):
        sys_ = NeRFSystem(
            RenderConfig(n_samples=8, n_importance=8, perturb=1.0,
                         noise_std=0.0),
            TrainConfig(lr=5e-3, batch_size=64, decay_step=(100,)),
            NeRFConfig(), steps_per_epoch=8, train_backend=backend,
            culled_candidates=16, culled_sel=8, culled_uni=4)
        return sys_, sys_.init_state(jax.random.PRNGKey(0))

    sys_f, state_f = mk("culled_fused")
    sys_j, state_j = mk("culled")
    key = jax.random.PRNGKey(1)
    state_f, mf = sys_f.train_step(state_f, batch, key)
    state_j, mj = sys_j.train_step(state_j, batch, key)
    np.testing.assert_allclose(float(mf["train/loss"]),
                               float(mj["train/loss"]), rtol=2e-2)
    state_f, mf = sys_f.train_step(state_f, batch, key)
    assert np.isfinite(float(mf["train/loss"]))
