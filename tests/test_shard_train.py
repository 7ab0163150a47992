"""Explicit-collective (shard_map+psum) train step must match the
auto-partitioned path exactly — the executable DDP specification."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from nerf_siren_tpu.parallel.shard_train import make_shard_map_train_step
from nerf_siren_tpu.render.rendering import render_rays
from nerf_siren_tpu.training.losses import mse_loss
from nerf_siren_tpu.training.optimizers import get_optimizer


def test_shard_map_step_matches_auto_partitioned(rng):
    mesh = make_mesh()
    assert mesh.devices.size == 8

    render_cfg = RenderConfig(n_samples=16, noise_std=0.0, perturb=0.0)
    nerf_cfg = NeRFConfig(depth=2, width=32)
    tx = get_optimizer(TrainConfig(optimizer="sgd", lr=1e-2, momentum=0.0,
                                   decay_step=(100,)), 10)

    params = {"coarse": init_nerf(jax.random.PRNGKey(0), nerf_cfg)}
    opt_state = tx.init(params)

    n = 512
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((n, 1), 2, np.float32),
                           np.full((n, 1), 6, np.float32)], -1)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    # explicit-collective path
    step = make_shard_map_train_step(mesh, tx, render_cfg, nerf_cfg)
    p_r = replicate(params, mesh)
    o_r = replicate(opt_state, mesh)
    batch = shard_rays({"rays": jnp.asarray(rays), "rgbs": jnp.asarray(rgbs)}, mesh)
    p1, _, m1 = step(p_r, o_r, batch["rays"], batch["rgbs"], None)

    # auto-partitioned reference: same math on one device
    def loss_fn(p):
        out = render_rays(p, jnp.asarray(rays), render_cfg, None, nerf_cfg=nerf_cfg)
        return mse_loss(out, jnp.asarray(rgbs))["sum"]

    loss0, grads = jax.value_and_grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    p_expected = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(float(m1["train/loss"]), float(loss0),
                               rtol=1e-5, atol=1e-7)
    # SGD keeps updates linear in the gradients, so the only difference is
    # f32 reduction order (per-shard-mean-then-psum vs global mean); adam's
    # rsqrt normalization would amplify near-zero-grad rounding arbitrarily
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p_expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(ka))
