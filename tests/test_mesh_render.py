"""Multi-chip reach of the FLAGSHIP renderers and the production trainer
(VERDICT r4 items 2+3): the fast and fused eval paths render shard-equal on
the 8-virtual-device mesh, and the recommended production training backend
(culled_fused — pallas_call under shard-spanning jit) is mesh-size
invariant. Single-device references use a 1-device mesh of the same CPU
backend, so any divergence is the sharding, not the platform.

Reference distribution contract this mirrors: every GPU renders/trains its
slice (reference train.py:47-63)."""
import numpy as np
import jax
import jax.numpy as jnp
from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.parallel.mesh import make_mesh, sharded_tile_render
from nerf_siren_tpu.render.fast import init_proxy, render_rays_fast


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate(
        [rng.normal(size=(n, 3)).astype(np.float32) * 0.1, d,
         np.full((n, 1), 2, np.float32), np.full((n, 1), 6, np.float32)], -1))


def test_sharded_fast_render_matches_single():
    """render_rays_fast (jnp branch + fused-field-kernel branch) through
    sharded_tile_render == the single-device lax.map composition, on an
    odd ray count (pad/slice path)."""
    from nerf_siren_tpu.ops.pallas import fused_mlp

    old = fused_mlp.TILE_N
    fused_mlp.TILE_N = 128
    try:
        cfg = NeRFConfig()  # field kernel requires the 8x256 topology
        params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
        packed = fused_mlp.pack_model_params(params, cfg)
        proxy = init_proxy(jax.random.PRNGKey(1))
        rays = _rays(100)  # odd: pads to 8 devices x chunk

        for packed_params in (None, packed):
            def tile(t, pp=packed_params):
                return render_rays_fast(
                    params, proxy, t, n_candidates=32, n_keep=8,
                    nerf_cfg=cfg, white_back=True,
                    scene_aabb=([-2] * 3, [2] * 3), select="pdf",
                    packed_params=pp)

            ref = tile(rays)
            mesh = make_mesh()
            assert mesh.devices.size == 8
            got = sharded_tile_render(tile, mesh, chunk=16)(rays)
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]), atol=2e-5,
                    rtol=1e-5,
                    err_msg=f"{k} (packed={packed_params is not None})")
    finally:
        fused_mlp.TILE_N = old


def test_sharded_fused_render_matches_single():
    """The fused exact renderer (coarse sigma kernel + pdf + fine full
    kernel) shards over the data mesh and matches single-device output."""
    from nerf_siren_tpu.ops.pallas import fused_mlp
    from nerf_siren_tpu.render.fused import render_rays_fused

    old = fused_mlp.TILE_N
    fused_mlp.TILE_N = 128
    try:
        cfg = NeRFConfig()
        params = {"coarse": init_nerf(jax.random.PRNGKey(0), cfg),
                  "fine": init_nerf(jax.random.PRNGKey(1), cfg)}
        packed = fused_mlp.pack_model_params(params, cfg)
        rcfg = RenderConfig(n_samples=8, n_importance=8, perturb=0.0,
                            noise_std=0.0, white_back=True, test_time=True)
        rays = _rays(100, seed=3)

        def tile(t):
            return render_rays_fused(packed, t, rcfg, nerf_cfg=cfg)

        ref = tile(rays)
        got = sharded_tile_render(tile, make_mesh(), chunk=16)(rays)
        # coarse strict; fine majority-agreement — a random-init field's
        # near-flat CDFs maximize the documented f32 sample_pdf CDF-tie
        # tile-width sensitivity (same caveat as
        # tests/test_training.py::test_render_sharded_matches_single_device)
        np.testing.assert_allclose(np.asarray(got["opacity_coarse"]),
                                   np.asarray(ref["opacity_coarse"]),
                                   atol=1e-5)
        agree = np.isclose(np.asarray(got["rgb_fine"]),
                           np.asarray(ref["rgb_fine"]), atol=1e-4)
        assert agree.mean() > 0.85, f"fine agreement {agree.mean():.3f}"
    finally:
        fused_mlp.TILE_N = old


def test_culled_fused_backend_mesh_size_invariant():
    """The recommended production backend (culled_fused: proxy-march
    selection + fused train kernels) has the same first-step loss and
    finite second step on the 8-device mesh as on 1 device — pallas_call
    under the partitioned step is the known composition hazard
    (VERDICT r4 item 3)."""
    from nerf_siren_tpu.training.system import NeRFSystem

    batch_rays = _rays(64, seed=7)
    rng = np.random.default_rng(7)
    batch = {"rays": batch_rays,
             "rgbs": jnp.asarray(rng.uniform(0, 1, (64, 3)), jnp.float32)}

    def mk(mesh):
        sys_ = NeRFSystem(
            RenderConfig(n_samples=8, n_importance=8, perturb=1.0,
                         noise_std=0.0),
            TrainConfig(lr=5e-3, batch_size=64, decay_step=(100,)),
            NeRFConfig(), steps_per_epoch=8, train_backend="culled_fused",
            culled_candidates=16, culled_sel=8, culled_uni=4, mesh=mesh)
        return sys_, sys_.init_state(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)
    sys1, state1 = mk(make_mesh(devices=jax.devices()[:1]))
    state1, m1 = sys1.train_step(state1, batch, key)
    sys8, state8 = mk(make_mesh())
    assert sys8.mesh.devices.size == 8
    state8, m8 = sys8.train_step(state8, batch, key)
    np.testing.assert_allclose(float(m8["train/loss"]),
                               float(m1["train/loss"]), rtol=2e-2)
    state8, m8 = sys8.train_step(state8, batch, key)
    assert np.isfinite(float(m8["train/loss"]))


def test_auto_cull_renderer_on_mesh_matches_single():
    """make_auto_cull_renderer(mesh=...) — per-shard budgets over the
    8-device mesh (VERDICT r4 item 2's auto-cull clause): frame output
    matches the single-device auto renderer across a 2-frame budget
    warmup (first frame renders everything on both; second runs at the
    measured budget)."""
    from nerf_siren_tpu.ops.pallas import fused_mlp, proxy_march
    from nerf_siren_tpu.ops.pallas.proxy_march import pack_proxy_params
    from nerf_siren_tpu.render.fast import (init_proxy,
                                            make_auto_cull_renderer)

    old_n, old_r = fused_mlp.TILE_N, proxy_march.TILE_R
    fused_mlp.TILE_N = 128
    proxy_march.TILE_R = 256
    try:
        cfg = NeRFConfig()
        params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
        packed = fused_mlp.pack_model_params(params, cfg)
        proxy = init_proxy(jax.random.PRNGKey(1))
        packed_proxy = pack_proxy_params(proxy)
        rays = _rays(4000, seed=2)   # odd count: both pads exercised

        def mk(mesh):
            return make_auto_cull_renderer(
                params, proxy, n_candidates=16, n_keep=4, nerf_cfg=cfg,
                white_back=True, scene_aabb=([-2] * 3, [2] * 3),
                packed_params=packed, packed_proxy=packed_proxy,
                prepass_candidates=8, block=128, mesh=mesh)

        single = mk(None)
        meshed = mk(make_mesh())
        for frame in range(2):
            ref = single(rays)
            got = meshed(rays)
            for k in ref:
                a, b = np.asarray(got[k]), np.asarray(ref[k])
                assert a.shape == b.shape, (k, a.shape, b.shape)
                agree = np.isclose(a, b, atol=1e-4)
                assert agree.mean() > 0.98, \
                    f"frame {frame} {k}: agreement {agree.mean():.3f}"
    finally:
        fused_mlp.TILE_N = old_n
        proxy_march.TILE_R = old_r
