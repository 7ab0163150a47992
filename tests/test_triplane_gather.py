"""Pallas triplane tile-gather kernel (ops/pallas/triplane_gather.py):
exact parity with the jnp block-gather sampler, including zero-padding
border semantics and the fixed-capacity group-miss fallback, plus the full
importance_render pipeline driven through the kernel sampler.

Reference hot loop this accelerates: volumetric_rendering/renderer.py:55-65
(SURVEY §2.4's designated perf-critical Pallas candidate)."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_siren_tpu.render.triplane import (
    make_kernel_plane_sampler,
    pack_planes_for_sampling,
    sample_from_packed_planes,
)


def _scene(rng, C=32, H=32, W=32):
    planes = jnp.asarray(rng.normal(size=(1, 3, C, H, W)), jnp.float32)
    return pack_planes_for_sampling(planes, dtype=jnp.float32)


def _camera_points(R=64, S=16, fov_div=40.0):
    """Coherent camera-like points: R rays from an 8x8 frame marching S
    uniform depths — the footprint regime the kernel is built for."""
    side = int(np.sqrt(R))
    o = np.array([0, 0, 2.5], np.float32)
    ii, jj = np.meshgrid(np.arange(side), np.arange(side))
    d = np.stack([(ii.reshape(-1) - side / 2) / fov_div,
                  (jj.reshape(-1) - side / 2) / fov_div,
                  -np.ones(R)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(0.5, 4.5, S, dtype=np.float32)
    return jnp.asarray((o + d[:, None, :] * t[None, :, None]
                        ).reshape(1, R * S, 3))


def test_kernel_sampler_matches_packed_gather():
    rng = np.random.default_rng(0)
    packed = _scene(rng)
    coords = _camera_points()
    ref = sample_from_packed_planes(packed, coords, 8.0)
    sampler = make_kernel_plane_sampler(packed, 8.0, 64, 16, rb=8, sb=4,
                                        tile_h=16, tile_px=16)
    got = sampler(coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert int(np.asarray(sampler.last_miss_groups)) == 0
    assert not bool(np.asarray(sampler.last_miss_overflow))


def test_kernel_sampler_border_zero_semantics():
    """Points straddling and beyond the plane edge reproduce the jnp
    path's zero-padding semantics exactly."""
    rng = np.random.default_rng(1)
    packed = _scene(rng)
    coords = jnp.asarray(rng.uniform(-1.05, 1.05, (1, 64 * 16, 3)) * 4.0,
                         jnp.float32)
    ref = sample_from_packed_planes(packed, coords, 8.0)
    sampler = make_kernel_plane_sampler(packed, 8.0, 64, 16, rb=8, sb=4,
                                        tile_h=16, tile_px=16,
                                        miss_cap_frac=1.0)
    got = sampler(coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_group_miss_fallback_is_exact():
    """Incoherent points overflow every tile; the group-capacity fallback
    re-samples them through the jnp path bit-exactly (f32 table)."""
    rng = np.random.default_rng(2)
    packed = _scene(rng)
    coords = jnp.asarray(rng.uniform(-4, 4, (1, 64 * 16, 3)), jnp.float32)
    ref = sample_from_packed_planes(packed, coords, 8.0)
    sampler = make_kernel_plane_sampler(packed, 8.0, 64, 16, rb=8, sb=4,
                                        tile_h=16, tile_px=8,
                                        miss_cap_frac=1.0)
    got = sampler(coords)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(np.asarray(sampler.last_miss_groups)) > 0


def test_importance_render_with_kernel_sampler():
    """Full coarse+fine triplane render through the kernel sampler matches
    the packed-gather render (same f32 table -> identical sampling; any
    difference would be a wiring bug)."""
    from nerf_siren_tpu.render.triplane import (RenderingOptions,
                                                importance_render,
                                                init_osg_decoder)

    rng = np.random.default_rng(3)
    packed = _scene(rng)
    dec = init_osg_decoder(jax.random.PRNGKey(0), n_features=32)
    R = 64
    side = 8
    ii, jj = np.meshgrid(np.arange(side), np.arange(side))
    d = np.stack([(ii.reshape(-1) - side / 2) / 40.0,
                  (jj.reshape(-1) - side / 2) / 40.0,
                  -np.ones(R)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([0, 0, 2.5], np.float32), d.shape)
    opts = RenderingOptions(depth_resolution=16,
                            depth_resolution_importance=16,
                            ray_start=0.5, ray_end=4.5, box_warp=8.0)
    ray_o = jnp.asarray(o)[None]
    ray_d = jnp.asarray(d)[None]
    ref = importance_render(packed, dec, ray_o, ray_d, opts, packed=True)
    sampler = make_kernel_plane_sampler(packed, 8.0, R, rb=8, sb=4,
                                        tile_h=16, tile_px=16,
                                        miss_cap_frac=1.0)
    got = importance_render(packed, dec, ray_o, ray_d, opts, packed=True,
                            sampler=sampler)
    for a, b, name in zip(got, ref, ("rgb_c", "d_c", "o_c",
                                     "rgb_f", "d_f", "o_f")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=name)


def test_eg3d_system_render_kernel_sampler_matches_gather():
    """EG3DSystem.render(plane_sampler='kernel') reproduces the gather
    path's frame (same bf16 table feeds both; tiny planes always fit one
    tile, so no fallback ambiguity)."""
    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.render.triplane import (RenderingOptions,
                                                TriPlaneConfig)
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    tiny = TriPlaneConfig(
        z_dim=32, w_dim=32, plane_resolution=16, plane_channels=8,
        mapping_layers=2, channel_base=512, channel_max=32,
        rendering=RenderingOptions(depth_resolution=8,
                                   depth_resolution_importance=8,
                                   ray_start=0.5, ray_end=4.0, box_warp=4.0))

    def mk(sampler):
        return EG3DSystem(RenderConfig(), TrainConfig(), steps_per_epoch=1,
                          triplane_cfg=tiny, plane_sampler=sampler)

    sys_g = mk("gather")
    params = sys_g.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    d = rng.normal(size=(64, 3)).astype(np.float32) * 0.1
    d[:, 2] -= 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.array([0, 0, 2.5], np.float32), d.shape)
    rays = np.concatenate([o, d], -1)

    ref = mk("gather").render(params, rays, chunk=64)
    got = mk("kernel").render(params, rays, chunk=64)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=2e-4, rtol=1e-3, err_msg=k)
