"""EG3D triplane renderer tests: plane projection, ray-box limits, mip ray
marcher oracle, importance renderer contract, EG3D system training smoke."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_siren_tpu.render.triplane import (
    RenderingOptions,
    TriPlaneConfig,
    batched_linspace,
    eg3d_render,
    get_ray_limits_box,
    importance_render,
    init_eg3d_renderer,
    init_osg_decoder,
    mip_ray_march,
    project_onto_planes,
    sample_from_planes,
    sample_importance,
    unify_samples,
)

TINY = TriPlaneConfig(
    z_dim=32, w_dim=32, plane_resolution=16, plane_channels=8,
    mapping_layers=2, channel_base=512, channel_max=32,
    rendering=RenderingOptions(depth_resolution=12, depth_resolution_importance=8,
                               ray_start=0.5, ray_end=4.0, box_warp=4.0))


def test_project_onto_planes_axes():
    coords = jnp.asarray([[[1.0, 2.0, 3.0]]])  # (1, 1, 3)
    proj = np.asarray(project_onto_planes(coords))  # (3, 1, 2)
    # torch-oracle values: bmm(coords, inv(planes))[..., :2]
    np.testing.assert_allclose(proj[0, 0], [1, 2], atol=1e-6)
    np.testing.assert_allclose(proj[1, 0], [1, 3], atol=1e-6)
    np.testing.assert_allclose(proj[2, 0], [3, 1], atol=1e-6)


def test_ray_box_limits():
    o = jnp.asarray([[[0.0, 0.0, -5.0], [10.0, 10.0, -5.0]]])
    d = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]])
    tmin, tmax = get_ray_limits_box(o, d, box_side_length=2.0)
    np.testing.assert_allclose(np.asarray(tmin[0, 0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tmax[0, 0]), 6.0, atol=1e-5)
    # miss → (-1, -2)
    np.testing.assert_allclose(np.asarray(tmin[0, 1]), -1.0)
    np.testing.assert_allclose(np.asarray(tmax[0, 1]), -2.0)


def test_batched_linspace():
    start = jnp.asarray([[0.0], [1.0]])
    stop = jnp.asarray([[1.0], [3.0]])
    out = np.asarray(batched_linspace(start, stop, 5))
    assert out.shape == (5, 2, 1)
    np.testing.assert_allclose(out[:, 0, 0], np.linspace(0, 1, 5), atol=1e-6)
    np.testing.assert_allclose(out[:, 1, 0], np.linspace(1, 3, 5), atol=1e-6)


def test_mip_ray_march_oracle(rng):
    """Literal numpy re-derivation of reference ray_marcher.py:26-53."""
    n, r, s = 1, 7, 12
    depths = np.sort(rng.uniform(1, 5, (n, r, s, 1)).astype(np.float32), axis=2)
    colors = rng.uniform(0, 1, (n, r, s, 3)).astype(np.float32)
    dens = rng.standard_normal((n, r, s, 1)).astype(np.float32)

    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    c_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    d_mid = (dens[:, :, :-1] + dens[:, :, 1:]) / 2
    z_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2
    d_act = np.log1p(np.exp(d_mid - 1))
    alpha = 1 - np.exp(-d_act * deltas)
    shifted = np.concatenate([np.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], 2)
    w = alpha * np.cumprod(shifted, 2)[:, :, :-1]
    rgb_e = (w * c_mid).sum(2)
    wt = w.sum(2)
    depth_e = np.clip(np.nan_to_num((w * z_mid).sum(2) / wt, nan=np.inf),
                      depths.min(), depths.max())

    rgb, depth, weights = mip_ray_march(jnp.asarray(colors), jnp.asarray(dens),
                                        jnp.asarray(depths))
    np.testing.assert_allclose(np.asarray(rgb), rgb_e, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), depth_e, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(weights), w, rtol=1e-4, atol=1e-6)


def test_sample_from_planes_center_value(rng):
    feats = jnp.asarray(rng.standard_normal((1, 3, 4, 8, 8)).astype(np.float32))
    coords = jnp.zeros((1, 1, 3))
    out = np.asarray(sample_from_planes(feats, coords, box_warp=2.0))
    assert out.shape == (1, 3, 1, 4)
    # center of an 8x8 grid with align_corners=False: average of 4 center texels
    f = np.asarray(feats)
    for p in range(3):
        expected = f[0, p, :, 3:5, 3:5].mean(axis=(1, 2))
        np.testing.assert_allclose(out[0, p, 0], expected, rtol=1e-4, atol=1e-5)


def test_unify_samples_sorted(rng):
    d1 = jnp.asarray(np.sort(rng.uniform(0, 1, (1, 4, 6, 1)), 2).astype(np.float32))
    d2 = jnp.asarray(np.sort(rng.uniform(0, 1, (1, 4, 5, 1)), 2).astype(np.float32))
    c1 = jnp.asarray(rng.uniform(0, 1, (1, 4, 6, 3)).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(0, 1, (1, 4, 5, 3)).astype(np.float32))
    s1 = jnp.asarray(rng.uniform(0, 1, (1, 4, 6, 1)).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0, 1, (1, 4, 5, 1)).astype(np.float32))
    d, c, s = unify_samples(d1, c1, s1, d2, c2, s2)
    assert d.shape == (1, 4, 11, 1) and c.shape == (1, 4, 11, 3)
    dn = np.asarray(d)[..., 0]
    assert np.all(np.diff(dn, axis=-1) >= 0)
    # color follows its depth: check one (ray, sample) pair
    all_d = np.concatenate([np.asarray(d1), np.asarray(d2)], 2)[0, 0, :, 0]
    all_c = np.concatenate([np.asarray(c1), np.asarray(c2)], 2)[0, 0]
    order = np.argsort(all_d)
    np.testing.assert_allclose(np.asarray(c)[0, 0], all_c[order], rtol=1e-6)


def test_importance_render_contract(rng):
    params = init_eg3d_renderer(jax.random.PRNGKey(0), TINY)
    r = 9
    o = np.zeros((1, r, 3), np.float32)
    o[..., 2] = -2.0
    d = rng.normal(size=(1, r, 3)).astype(np.float32)
    d[..., 2] = np.abs(d[..., 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    from nerf_siren_tpu.render.triplane import triplane_mapping, triplane_planes
    ws = triplane_mapping(params, TINY, params["z"])
    planes = triplane_planes(params, TINY, ws)
    assert planes.shape == (1, 3, 8, 16, 16)

    out = importance_render(planes, params["decoder"], jnp.asarray(o),
                            jnp.asarray(d), TINY.rendering)
    rgb_c, d_c, w_c, rgb_f, d_f, w_f = out
    assert rgb_c.shape == (1, r, 3) and rgb_f.shape == (1, r, 3)
    assert d_f.shape == (1, r, 1) and w_f.shape == (1, r, 1)
    for t in out:
        assert np.isfinite(np.asarray(t)).all()


def test_ray_start_auto(rng):
    cfg = TriPlaneConfig(
        z_dim=32, w_dim=32, plane_resolution=16, plane_channels=8,
        mapping_layers=2, channel_base=512, channel_max=32,
        rendering=RenderingOptions(depth_resolution=8, depth_resolution_importance=4,
                                   ray_start="auto", ray_end="auto", box_warp=4.0))
    params = init_eg3d_renderer(jax.random.PRNGKey(0), cfg)
    o = np.zeros((8, 3), np.float32)
    o[:, 2] = -5.0
    d = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (8, 1))
    out = eg3d_render(params, cfg, jnp.asarray(o), jnp.asarray(d))
    assert np.isfinite(np.asarray(out["rgb_fine"])).all()
    # depth must lie inside the box interval [3, 7]
    depth = np.asarray(out["depth_fine"])
    assert depth.min() >= 3.0 - 1e-3 and depth.max() <= 7.0 + 1e-3


def test_eg3d_system_trains(rng):
    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    system = EG3DSystem(RenderConfig(), TrainConfig(lr=1e-2, decay_step=(100,)),
                        steps_per_epoch=4, triplane_cfg=TINY)
    n = 64
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((n, 1), 0.5, np.float32),
                           np.full((n, 1), 4.0, np.float32)], -1)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    state = system.init_state(jax.random.PRNGKey(0))
    losses = []
    for _ in range(5):
        state, m = system.train_step(state, {"rays": rays, "rgbs": rgbs},
                                     jax.random.PRNGKey(1))
        losses.append(float(m["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"EG3D did not train: {losses}"
    # the learnable z moves
    z0 = np.asarray(init_eg3d_renderer(jax.random.PRNGKey(0), TINY)["z"])
    assert not np.allclose(np.asarray(state.params["eg3d_renderer"]["z"]), z0)

    out = system.render(state.params, rays[:32], chunk=16)
    assert out["rgb_fine"].shape == (32, 3)


def test_eg3d_train_scan_importance(rng):
    """EG3D loss-guided scan: trains in one program with finite loss."""
    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    system = EG3DSystem(RenderConfig(), TrainConfig(lr=1e-2, decay_step=(100,)),
                        steps_per_epoch=4, triplane_cfg=TINY)
    n = 256
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d], -1).astype(np.float32)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    state = system.init_state(jax.random.PRNGKey(0))
    state, m0 = system.train_scan_importance(
        state, rays, rgbs, jax.random.PRNGKey(1), 2, batch_size=64)
    state, m1 = system.train_scan_importance(
        state, rays, rgbs, jax.random.PRNGKey(2), 10, batch_size=64)
    assert int(state.step) == 12
    assert np.isfinite(float(m1["train/loss"]))
    assert float(m1["train/loss"]) < float(m0["train/loss"]) * 2  # sane


def test_eg3d_render_sharded_matches_single(rng):
    """EG3DSystem.render_sharded over the 8-device mesh reproduces render()
    (bf16 packed tables both paths). Coarse outputs strict; fine outputs
    carry the f32 sample_pdf CDF-tie sensitivity under different tile
    widths (see tests/test_training.py::test_render_sharded_...)."""
    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    system = EG3DSystem(RenderConfig(), TrainConfig(lr=1e-2, decay_step=(100,)),
                        steps_per_epoch=4, triplane_cfg=TINY)
    assert system.mesh.shape["data"] == len(jax.devices())
    params = system.init_params(jax.random.PRNGKey(0))
    n = 101  # odd: pads to a device multiple and slices back
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d], -1)

    ref = system.render(params, rays, chunk=16)
    out = system.render_sharded(params, rays, chunk=16)
    assert set(out) == set(ref)
    for k in ("rgb_coarse", "depth_coarse", "opacity_coarse"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-4, err_msg=k)
    agree = np.isclose(np.asarray(out["rgb_fine"]),
                       np.asarray(ref["rgb_fine"]), atol=1e-3)
    assert agree.mean() > 0.85, f"fine agreement {agree.mean():.3f}"


def test_w_avg_ema_updates_during_training(rng):
    """w_avg must track the EMA of the mapping output during training
    (reference networks_stylegan2.py:251-254) so truncation_psi<1 works on a
    trained model instead of reading the zero init."""
    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.render.triplane import triplane_mapping_pre_broadcast
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    system = EG3DSystem(RenderConfig(), TrainConfig(lr=1e-3, decay_step=(100,)),
                        steps_per_epoch=4, triplane_cfg=TINY)
    n = 16
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.full((n, 1), 0.5, np.float32),
                           np.full((n, 1), 4.0, np.float32)], -1)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    batch = {"rays": rays, "rgbs": rgbs}

    state = system.init_state(jax.random.PRNGKey(0))
    beta = TINY.backbone.mapping.w_avg_beta

    # oracle: replay the reference EMA recurrence with the pre-update params
    # of every step (the reference updates w_avg during the forward pass)
    expected = np.zeros(TINY.w_dim, np.float64)
    for _ in range(3):
        renderer = state.params["eg3d_renderer"]
        w_pre = np.asarray(triplane_mapping_pre_broadcast(
            renderer, TINY, renderer["z"]), np.float64)
        mean = w_pre.mean(axis=0)
        expected = mean + beta * (expected - mean)
        state, _ = system.train_step(state, batch, jax.random.PRNGKey(1))

    got = np.asarray(
        state.params["eg3d_renderer"]["backbone"]["mapping"]["w_avg"])
    assert not np.allclose(got, 0.0), "w_avg never written during training"
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    # truncation now changes the render on the trained model
    full = system.render(state.params, rays[:8], chunk=8)["rgb_fine"]
    ws_t = jnp.asarray(triplane_mapping_pre_broadcast(
        state.params["eg3d_renderer"], TINY,
        state.params["eg3d_renderer"]["z"]))
    from nerf_siren_tpu.render.triplane import triplane_mapping, triplane_synthesis
    ws_trunc = triplane_mapping(state.params["eg3d_renderer"], TINY,
                                state.params["eg3d_renderer"]["z"],
                                truncation_psi=0.2)
    out_t = triplane_synthesis(state.params["eg3d_renderer"], TINY, ws_trunc,
                               jnp.asarray(rays[None, :8, 0:3]),
                               jnp.asarray(rays[None, :8, 3:6]))
    assert not np.allclose(np.asarray(out_t["rgb_fine"][0]),
                           np.asarray(full), atol=1e-5)


def test_importance_render_packed_matches_unpacked(rng):
    """packed=True with an f32 pack_planes_for_sampling table is the same
    render bitwise; a bf16 table agrees to table-rounding precision."""
    from nerf_siren_tpu.render.triplane import (pack_planes_for_sampling,
                                                sample_from_packed_planes)
    planes = jnp.asarray(rng.standard_normal((1, 3, 4, 8, 8)).astype(np.float32))
    dec = init_osg_decoder(jax.random.PRNGKey(0), n_features=4, hidden=8)
    o = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 6, 3)).astype(np.float32))
    d = rng.standard_normal((1, 6, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    opt = RenderingOptions(depth_resolution=12, depth_resolution_importance=8,
                           ray_start=0.5, ray_end=4.0, box_warp=4.0)

    base = importance_render(planes, dec, o, d, opt, None)
    packed32 = pack_planes_for_sampling(planes, jnp.float32)
    got32 = importance_render(packed32, dec, o, d, opt, None, packed=True)
    for a, b in zip(base, got32):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    packed16 = pack_planes_for_sampling(planes, jnp.bfloat16)
    got16 = importance_render(packed16, dec, o, d, opt, None, packed=True)
    for a, b in zip(base, got16):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3e-2)

    # the raw sampling table too: f32 exact
    coords = jnp.asarray(rng.uniform(-1.5, 1.5, (1, 30, 3)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(sample_from_planes(planes, coords, 4.0)),
        np.asarray(sample_from_packed_planes(packed32, coords, 4.0)))
