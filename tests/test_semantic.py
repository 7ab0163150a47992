"""Semantic stack tests: PointNet, voxel UNet, render_rays_3d, NeRF3DSystem."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.models.pointnet import (
    apply_pointnet_dense_cls,
    apply_stn3d,
    feature_transform_regularizer,
    init_pointnet_dense_cls,
    init_stn3d,
)
from nerf_siren_tpu.models.voxel_unet import (
    apply_voxel_unet_points,
    init_voxel_unet,
    voxelize_points,
)
from nerf_siren_tpu.render.rendering_3d import render_rays_3d, semantic_from_weights


def test_stn3d_shape_and_identity_bias():
    params = init_stn3d(jax.random.PRNGKey(0))
    xyz = jax.random.normal(jax.random.PRNGKey(1), (50, 3))
    t = apply_stn3d(params, xyz, None)
    assert t.shape == (3, 3)
    # relu'd fc3 output + identity → diagonal >= 1 at init scale
    assert np.all(np.diag(np.asarray(t)) >= 1.0 - 1e-6)


def test_pointnet_dense_cls_logprobs():
    params = init_pointnet_dense_cls(jax.random.PRNGKey(0), k=6, inc=6)
    pts = jax.random.normal(jax.random.PRNGKey(1), (100, 6))
    out = apply_pointnet_dense_cls(params, pts, None)
    assert out.shape == (100, 6)
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0, rtol=1e-4)


def test_pointnet_mask_invariance():
    """Padding rows beyond the mask must not change valid outputs."""
    params = init_pointnet_dense_cls(jax.random.PRNGKey(0), k=6, inc=6)
    pts = jax.random.normal(jax.random.PRNGKey(1), (60, 6))
    mask_full = jnp.ones(60, bool)
    out_full = apply_pointnet_dense_cls(params, pts, mask_full)

    # same cloud + 40 garbage rows, masked out
    garbage = 100.0 * jax.random.normal(jax.random.PRNGKey(2), (40, 6))
    pts_pad = jnp.concatenate([pts, garbage])
    mask_pad = jnp.concatenate([mask_full, jnp.zeros(40, bool)])
    out_pad = apply_pointnet_dense_cls(params, pts_pad, mask_pad)
    np.testing.assert_allclose(np.asarray(out_pad[:60]), np.asarray(out_full),
                               rtol=1e-4, atol=1e-5)


def test_feature_transform_regularizer():
    eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
    assert float(feature_transform_regularizer(eye)) < 1e-6
    off = eye + 0.5
    assert float(feature_transform_regularizer(off)) > 0.1


def test_voxelize_points():
    pts = jnp.asarray([[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5]], jnp.float32)
    feats = jnp.asarray([[1.0], [2.0], [3.0]])
    grid, flat = voxelize_points(pts, feats, None, res=4)
    assert grid.shape == (1, 4, 4, 4, 1)
    g = np.asarray(grid[0, ..., 0])
    assert g[0, 0, 0] == 1.0 and g[3, 3, 3] == 2.0
    # scatter-mean: voxel occupancy preserved
    assert np.count_nonzero(g) == 3


def test_voxel_unet_points_contract():
    params = init_voxel_unet(jax.random.PRNGKey(0), in_channels=7, out_channels=6)
    pts = jax.random.normal(jax.random.PRNGKey(1), (128, 6))
    mask = jnp.arange(128) < 100
    out = apply_voxel_unet_points(params, pts, mask)
    assert out.shape == (128, 6)
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0, rtol=1e-4)


def test_semantic_from_weights_capacity_equivalence():
    """With capacity >= above-threshold points the result equals the
    unrestricted computation (masked-design correctness)."""
    key = jax.random.PRNGKey(0)
    params = init_pointnet_dense_cls(key, k=6, inc=6)
    r, s = 8, 16
    xyz = jax.random.normal(jax.random.PRNGKey(1), (r, s, 3))
    rgbs = jax.random.uniform(jax.random.PRNGKey(2), (r, s, 3))
    w = jax.random.uniform(jax.random.PRNGKey(3), (r, s))
    w = jnp.where(w > 0.7, w, 0.0)  # sparse weights

    big = semantic_from_weights(params, xyz, rgbs, w, n_classes=6,
                                threshold=0.0, point_capacity=r * s)
    exact_n = int(jnp.sum(w > 0))
    small = semantic_from_weights(params, xyz, rgbs, w, n_classes=6,
                                  threshold=0.0, point_capacity=exact_n)
    np.testing.assert_allclose(np.asarray(small), np.asarray(big), rtol=1e-4, atol=1e-5)


def _make_rays(n, rng):
    o = np.zeros((n, 3), np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))


@pytest.mark.parametrize("n_importance", [0, 8])
def test_render_rays_3d_contract(n_importance, rng):
    params = {
        "coarse": init_nerf(jax.random.PRNGKey(0)),
        "points": init_pointnet_dense_cls(jax.random.PRNGKey(2), k=6, inc=6),
    }
    if n_importance:
        params["fine"] = init_nerf(jax.random.PRNGKey(1))
    cfg = RenderConfig(n_samples=16, n_importance=n_importance, noise_std=0.0)
    out = render_rays_3d(params, _make_rays(12, rng), cfg, None,
                         point_capacity=64)
    expected = {"rgb_coarse", "depth_coarse", "opacity_coarse", "cls_coarse"}
    if n_importance:
        expected |= {"rgb_fine", "depth_fine", "opacity_fine", "cls_fine"}
    assert set(out) == expected
    assert out["cls_coarse"].shape == (12, 6)
    assert np.isfinite(np.asarray(out["cls_coarse"])).all()


def test_render_rays_3d_cls_threshold_override(rng):
    """cls_threshold overrides the reference test-time mask (weights > 0.5).

    A random-init field spreads transmittance over many samples, so at
    test_time the 0.5 mask selects nothing and every class logit row is
    exactly zero (semantic_from_weights zeroes invalid points); the
    training mask (0.0) keeps the top-k cloud valid and produces nonzero
    logits. Guards eval.py --cls_threshold (low-N_samples checkpoints).

    test_time=True requires a fine pass (the coarse branch is sigma-only,
    exactly like eval.py which sets test_time = N_importance > 0), so the
    contract is checked on cls_fine."""
    params = {
        "coarse": init_nerf(jax.random.PRNGKey(0)),
        "fine": init_nerf(jax.random.PRNGKey(1)),
        "points": init_pointnet_dense_cls(jax.random.PRNGKey(2), k=6, inc=6),
    }
    cfg = RenderConfig(n_samples=16, n_importance=16, noise_std=0.0,
                       test_time=True)
    rays = _make_rays(12, rng)
    ref = render_rays_3d(params, rays, cfg, None, point_capacity=64)
    over = render_rays_3d(params, rays, cfg, None, point_capacity=64,
                          cls_threshold=0.0)
    ref_cls = np.asarray(ref["cls_fine"])
    over_cls = np.asarray(over["cls_fine"])
    assert np.all(ref_cls == 0.0)          # 0.5 mask empty on a diffuse field
    assert np.any(over_cls != 0.0)         # training mask keeps the cloud
    # cls_threshold must not perturb the radiance outputs
    np.testing.assert_array_equal(np.asarray(ref["rgb_fine"]),
                                  np.asarray(over["rgb_fine"]))


def test_nerf3d_system_trains(rng):
    from nerf_siren_tpu.training.semantic_system import NeRF3DSystem

    n = 512
    rays = np.asarray(_make_rays(n, rng))
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cls_t = rng.integers(0, 6, n).astype(np.int32)

    system = NeRF3DSystem(
        RenderConfig(n_samples=16, noise_std=1.0, perturb=1.0),
        TrainConfig(lr=1e-3, loss_type="msenll", decay_step=(100,)),
        NeRFConfig(depth=2, width=32),
        steps_per_epoch=4, point_capacity=1024, no_grad_on_nerf=False)
    state = system.init_state(jax.random.PRNGKey(0))
    losses = []
    for _ in range(3):
        state, m = system.train_step(
            state, {"rays": rays, "rgbs": rgbs, "cls": cls_t}, jax.random.PRNGKey(1))
        losses.append(float(m["train/total_loss"]))
    assert np.isfinite(losses).all()
    assert float(m["train/cls_loss"]) != 0.0

    out = system.render(state.params, rays[:64])
    assert out["cls_coarse"].shape == (64, 6)


def test_nerf3d_render_sharded_matches_single(rng):
    """Semantic multi-chip render: with the per-tile ray count equal in both
    paths (chunk divides the shard size), tiling — and hence the per-tile
    fixed-capacity point selection — is identical, so outputs must match."""
    import jax
    from nerf_siren_tpu.training.semantic_system import NeRF3DSystem

    n = 1024  # divisible by 8 devices * chunk 64 → identical tiles
    rays = np.asarray(_make_rays(n, rng))
    system = NeRF3DSystem(
        RenderConfig(n_samples=8, chunk=64),
        TrainConfig(loss_type="msenll"), NeRFConfig(depth=2, width=32),
        steps_per_epoch=1, point_capacity=256, no_grad_on_nerf=False)
    assert system.mesh.shape["data"] == len(jax.devices())
    params = system.init_params(jax.random.PRNGKey(0))
    ref = system.render(params, rays)
    out = system.render_sharded(params, rays)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-4, err_msg=k)


def test_nerf3d_system_conv3d_variant(rng):
    from nerf_siren_tpu.training.semantic_system import NeRF3DSystem

    n = 256
    rays = np.asarray(_make_rays(n, rng))
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cls_t = rng.integers(0, 6, n).astype(np.int32)

    system = NeRF3DSystem(
        RenderConfig(n_samples=8, noise_std=1.0),
        TrainConfig(lr=1e-3, loss_type="msenll", decay_step=(100,)),
        NeRFConfig(depth=2, width=32),
        steps_per_epoch=4, semantic_network="conv3d",
        point_capacity=512, no_grad_on_nerf=False)
    state = system.init_state(jax.random.PRNGKey(0))
    state, m = system.train_step(
        state, {"rays": rays, "rgbs": rgbs, "cls": cls_t}, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["train/total_loss"]))


def test_colorize_cls_handles_classes_beyond_palette(tmp_path):
    """Replica scenes carry more semantic classes than the reference's
    23-color face-parsing palette; ids >= 23 must cycle, not crash
    (regression: class 23 raised IndexError in train.py validation)."""
    from nerf_siren_tpu.utils.color import PART_COLORS, color_cls, colorize_cls

    pred = np.arange(30, dtype=np.int32).reshape(5, 6)
    out = colorize_cls(pred)
    assert out.shape == (5, 6, 3)
    # class 0 black; 1..22 exact reference palette; >=23 cycles
    assert np.all(out[0, 0] == 0)
    assert np.array_equal(out[0, 1], PART_COLORS[1])
    assert np.array_equal(out.reshape(-1, 3)[23], PART_COLORS[0])
    img = np.zeros((5, 6, 3), np.uint8)
    overlay = color_cls(img, pred, str(tmp_path))
    assert overlay.shape == (5, 6, 3)
