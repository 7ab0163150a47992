"""Fused training kernels (ops/pallas/fused_mlp_train.py) vs jnp autodiff.

The forward must match apply_nerf(compute_dtype=bf16) like the inference
kernel does; the backward must reproduce jax.grad through the jnp field to
mixed-precision tolerance (the kernel's wgrads use bf16 operands with f32
accumulation; autodiff's use an f32 cotangent against bf16 activations, so
small relative deltas are expected)."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_siren_tpu.config import NeRFConfig
from nerf_siren_tpu.models.embedding import positional_encoding
from nerf_siren_tpu.models.nerf import apply_nerf, init_nerf
from nerf_siren_tpu.ops.pallas.fused_mlp_train import (
    TILE_T, fused_field_train)

CFG = NeRFConfig()


def _inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(xyz), jnp.asarray(dirs)


def _to_t(a):
    return jnp.pad(a.T, ((0, 8 - a.shape[1]), (0, 0)))


def test_fused_train_forward_matches_apply_nerf():
    params = init_nerf(jax.random.PRNGKey(0), CFG)
    xyz, dirs = _inputs(TILE_T)
    out = fused_field_train(params, _to_t(xyz), _to_t(dirs))
    ref = apply_nerf(params, positional_encoding(xyz, 10),
                     positional_encoding(dirs, 4), cfg=CFG,
                     compute_dtype=jnp.bfloat16)
    got = np.asarray(out[:4]).T                       # (N, 4) [rgb, sigma]
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-2, rtol=2e-2)
    # tighter on rgb (sigmoid-bounded)
    np.testing.assert_allclose(got[:, :3], np.asarray(ref)[:, :3], atol=5e-3)


def test_fused_train_grads_match_same_formulation_autodiff():
    """Backward kernel vs jax.grad through forward_tile_jnp — the SAME
    packed-weight formulation, so relu masks agree and elementwise grad
    parity is tight (bf16-operand wgrads vs autodiff's mixed precision)."""
    from nerf_siren_tpu.ops.pallas.fused_mlp_train import (
        forward_tile_jnp, pack_train_params)

    params = init_nerf(jax.random.PRNGKey(1), CFG)
    xyz, dirs = _inputs(TILE_T, seed=3)
    rng = np.random.default_rng(7)
    w8 = np.zeros((8, TILE_T), np.float32)
    w8[:4] = rng.normal(size=(4, TILE_T))
    w8 = jnp.asarray(w8)
    xyzT, dirT = _to_t(xyz), _to_t(dirs)

    def loss_fused(p):
        return jnp.sum(fused_field_train(p, xyzT, dirT) * w8) / TILE_T

    def loss_ref(p):
        return jnp.sum(forward_tile_jnp(pack_train_params(p), xyzT, dirT)
                       * w8) / TILE_T

    np.testing.assert_allclose(float(loss_fused(params)),
                               float(loss_ref(params)), rtol=1e-4)

    gf = jax.grad(loss_fused)(params)
    gr = jax.grad(loss_ref)(params)
    flat_f, tree_f = jax.tree_util.tree_flatten(gf)
    flat_r, tree_r = jax.tree_util.tree_flatten(gr)
    assert tree_f == tree_r
    for a, b, path in zip(flat_f, flat_r,
                          jax.tree_util.tree_leaves_with_path(gr)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert a.shape == b.shape, path[0]
        # the kernel casts each dgrad hop to bf16 (autodiff keeps f32
        # cotangents), so early layers carry up to DEPTH compounding
        # roundings — bound the leaf's relative L2 plus a loose
        # scale-normalized elementwise tail
        rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        assert rel_l2 < 0.01, f"{path[0]}: rel L2 {rel_l2:.4f}"
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                   err_msg=str(path[0]))


def test_fused_train_grads_close_to_apply_nerf_autodiff():
    """Cross-formulation check: relative-L2 grad distance to the jnp field's
    autodiff must be small. Elementwise parity is NOT expected — the ~0.1%
    of points whose pre-relu values straddle zero flip masks between
    formulations (bf16 embedding path differences), which is SGD-noise-level
    but shows up as isolated large elementwise deltas."""
    params = init_nerf(jax.random.PRNGKey(1), CFG)
    xyz, dirs = _inputs(TILE_T, seed=3)
    rng = np.random.default_rng(7)
    w4 = jnp.asarray(rng.normal(size=(TILE_T, 4)).astype(np.float32))
    xyzT, dirT = _to_t(xyz), _to_t(dirs)

    def loss_fused(p):
        return jnp.sum(fused_field_train(p, xyzT, dirT)[:4].T * w4) / TILE_T

    def loss_ref(p):
        out = apply_nerf(p, positional_encoding(xyz, 10),
                         positional_encoding(dirs, 4), cfg=CFG,
                         compute_dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) * w4) / TILE_T

    gf = jax.grad(loss_fused)(params)
    gr = jax.grad(loss_ref)(params)
    for a, b, path in zip(jax.tree_util.tree_leaves(gf),
                          jax.tree_util.tree_leaves(gr),
                          jax.tree_util.tree_leaves_with_path(gr)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel_l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)
        # earliest layers accumulate the most mask-flip noise (deepest
        # dgrad chain); the tight correctness gate is the
        # same-formulation test above
        assert rel_l2 < 0.10, f"{path[0]}: rel L2 {rel_l2:.4f}"


def test_fused_train_backend_trains():
    """NeRFSystem(train_backend='fused'): steps run, loss decreases, and the
    first step's loss matches the jnp backend to mixed-precision tolerance
    (identical batch; the fused path computes the field in bf16)."""
    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.training.system import NeRFSystem

    rng = np.random.default_rng(11)
    n = 128
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([np.zeros((n, 3), np.float32), d,
                           np.full((n, 1), 2, np.float32),
                           np.full((n, 1), 6, np.float32)], -1)
    rgbs = (0.5 + 0.5 * np.tanh(d)).astype(np.float32)
    batch = {"rays": rays, "rgbs": rgbs}

    def mk(backend):
        sys_ = NeRFSystem(
            RenderConfig(n_samples=8, n_importance=8, perturb=1.0,
                         noise_std=0.0),
            TrainConfig(lr=5e-3, batch_size=n, decay_step=(100,)),
            NeRFConfig(), steps_per_epoch=8, train_backend=backend)
        return sys_, sys_.init_state(jax.random.PRNGKey(0))

    sys_f, state_f = mk("fused")
    sys_j, state_j = mk("jnp")
    key = jax.random.PRNGKey(1)
    state_f, mf = sys_f.train_step(state_f, batch, key)
    state_j, mj = sys_j.train_step(state_j, batch, key)
    lf, lj = float(mf["train/loss"]), float(mj["train/loss"])
    np.testing.assert_allclose(lf, lj, rtol=2e-2)

    losses = [lf]
    for _ in range(7):
        state_f, mf = sys_f.train_step(state_f, batch, key)
        losses.append(float(mf["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"fused backend did not train: {losses}"

    # composes with the scanned trainer (lax.scan over the pallas kernels)
    state_f, mf = sys_f.train_scan_batches(
        state_f, np.stack([rays, rays]), np.stack([rgbs, rgbs]), key)
    assert np.isfinite(float(mf["train/loss"]))
    assert int(state_f.step) == 10


def test_fused_train_multi_tile_accumulation():
    """Grad over 2 tiles == sum of per-tile grads (the in-kernel
    accumulator over grid steps)."""
    params = init_nerf(jax.random.PRNGKey(2), CFG)
    xyz, dirs = _inputs(2 * TILE_T, seed=5)
    xyzT, dirT = _to_t(xyz), _to_t(dirs)

    def loss(p, xT, dT):
        out = fused_field_train(p, xT, dT)
        return jnp.sum(out[:4] ** 2)

    g_all = jax.grad(loss)(params, xyzT, dirT)
    g_a = jax.grad(loss)(params, xyzT[:, :TILE_T], dirT[:, :TILE_T])
    g_b = jax.grad(loss)(params, xyzT[:, TILE_T:], dirT[:, TILE_T:])
    for ga, gab in zip(jax.tree_util.tree_leaves(g_all),
                       jax.tree_util.tree_leaves(
                           jax.tree_util.tree_map(lambda a, b: a + b, g_a, g_b))):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gab),
                                   rtol=1e-4, atol=1e-5)
