"""Benchmark: rendering throughput in rays/sec/chip.

Config 2 of BASELINE.md: Blender lego 800x800, coarse+fine
(N_samples=64, N_importance=64, hierarchical sample_pdf), eval-style
deterministic rendering (test_time sigma-only coarse pass, like the
reference's eval.py batched_inference).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 5e6 (the driver target: >=5M rays/s/chip on v5e).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nerf_siren_tpu.config import NeRFConfig, RenderConfig
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.ops.pallas.fused_mlp import pack_model_params
    from nerf_siren_tpu.render.fused import render_rays_fused
    from nerf_siren_tpu.render.rendering import render_rays

    render_cfg = RenderConfig(
        n_samples=64, n_importance=64, perturb=0.0, noise_std=0.0,
        white_back=True, test_time=True,
    )
    nerf_cfg = NeRFConfig()
    compute_dtype = jnp.bfloat16

    params = {
        "coarse": init_nerf(jax.random.PRNGKey(0), nerf_cfg),
        "fine": init_nerf(jax.random.PRNGKey(1), nerf_cfg),
    }

    # lego 800x800 = 640k rays/frame; render in fixed-size tiles
    H = W = 800
    n_rays_frame = H * W
    chunk = 40_000
    rng = np.random.default_rng(0)
    d = rng.normal(size=(n_rays_frame, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_np = np.concatenate(
        [np.zeros((n_rays_frame, 3), np.float32) + np.asarray([0, 0, 4.0], np.float32),
         d,
         np.full((n_rays_frame, 1), 2.0, np.float32),
         np.full((n_rays_frame, 1), 6.0, np.float32)], axis=-1)

    tiles = jnp.asarray(rays_np.reshape(n_rays_frame // chunk, chunk, 8))
    packed = pack_model_params(params, nerf_cfg)

    # headline: exact coarse+fine math through the fused transposed Pallas
    # field kernel (ops/pallas/fused_mlp.py + render/fused.py) — same output
    # as the jnp path (parity asserted in tests/test_fused_mlp.py)
    @jax.jit
    def render_frame(packed, tiles):
        def tile_fn(t):
            out = render_rays_fused(packed, t, render_cfg, nerf_cfg=nerf_cfg)
            return out["rgb_fine"], out["depth_fine"]
        rgb, depth = jax.lax.map(tile_fn, tiles)
        # scalar checksum: on tunneled platforms block_until_ready is
        # unreliable — a host fetch of this scalar is the sync point
        return rgb, depth, jnp.sum(rgb)

    @jax.jit
    def render_frame_jnp(params, tiles):
        def tile_fn(t):
            out = render_rays(params, t, render_cfg, None,
                              nerf_cfg=nerf_cfg, compute_dtype=compute_dtype)
            return out["rgb_fine"], out["depth_fine"]
        rgb, depth = jax.lax.map(tile_fn, tiles)
        return rgb, depth, jnp.sum(rgb)

    n_iters = 5

    def time_frames(fn, p):
        rgb, depth, chk = fn(p, tiles)  # warmup / compile (fetch syncs)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            rgb, depth, chk = fn(p, tiles)
        float(chk)
        return time.perf_counter() - t0

    dt = time_frames(render_frame, packed)
    dt_jnp = time_frames(render_frame_jnp, params)

    rays_per_sec = n_rays_frame * n_iters / dt
    n_chips = max(1, len(jax.devices()))
    value = rays_per_sec / n_chips
    jnp_rays_per_sec = n_rays_frame * n_iters / dt_jnp / n_chips

    # secondary: the proxy-culled fast path (render/fast.py) — same scene
    # shapes, quality validated against the exact renderer in
    # tests/test_fast_render.py (agreement figures measured there on the
    # multi-view synthetic scene)
    from nerf_siren_tpu.ops.pallas.proxy_march import pack_proxy_params
    from nerf_siren_tpu.render.fast import init_proxy, render_rays_fast

    proxy = init_proxy(jax.random.PRNGKey(2))
    packed_proxy = pack_proxy_params(proxy)
    aabb = ([-1.3, -1.3, -1.3], [1.3, 1.3, 1.3])  # lego-scale occupied box

    def time_fast(n_candidates, n_keep, cull=None):
        @jax.jit
        def fast_frame(params, proxy, tiles):
            def tile_fn(t):
                out = render_rays_fast(params, proxy, t,
                                       n_candidates=n_candidates, n_keep=n_keep,
                                       nerf_cfg=nerf_cfg, white_back=True,
                                       scene_aabb=aabb, select="pdf",
                                       packed_params=packed,
                                       packed_proxy=packed_proxy, cull=cull)
                return out["rgb_fine"]
            return jnp.sum(jax.lax.map(tile_fn, tiles))

        float(fast_frame(params, proxy, tiles))
        t0 = time.perf_counter()
        for _ in range(n_iters):
            chk = fast_frame(params, proxy, tiles)
        float(chk)
        fdt = time.perf_counter() - t0
        return n_rays_frame * n_iters / fdt / n_chips, fdt / n_iters

    fast_hi_q, fast_hi_q_lat = time_fast(32, 16)   # 32.04dB agreement at convergence
    fast_fast, fast_fast_lat = time_fast(32, 8)    # 29.7dB agreement at convergence
    fast_cull, fast_cull_lat = time_fast(32, 16, cull=0.65)  # 32.04dB (frontier)

    # training-step time at the reference's headline recipe (batch 1024,
    # 64+128 samples; reference README reports 0.12 s/step on a 2080 Ti)
    from nerf_siren_tpu.config import TrainConfig
    from nerf_siren_tpu.training.system import NeRFSystem

    system = NeRFSystem(
        RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                     noise_std=1.0, white_back=True),
        TrainConfig(lr=5e-4, batch_size=1024, decay_step=(2, 4, 8)),
        nerf_cfg, steps_per_epoch=1000)
    state = system.init_state(jax.random.PRNGKey(3))
    batch = {"rays": rays_np[:1024], "rgbs": rng.uniform(0, 1, (1024, 3)).astype(np.float32)}
    key = jax.random.PRNGKey(4)
    state, m = system.train_step(state, batch, key)
    float(m["train/loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = system.train_step(state, batch, key)
    float(m["train/loss"])
    train_step_s = (time.perf_counter() - t0) / 20

    # fused Pallas training backend (ops/pallas/fused_mlp_train.py):
    # bf16 field fwd+bwd in VMEM; guarded so a kernel regression degrades
    # to a null metric instead of killing the whole bench
    fused_step_s = None
    try:
        fsystem = NeRFSystem(
            RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                         noise_std=1.0, white_back=True),
            TrainConfig(lr=5e-4, batch_size=1024, decay_step=(2, 4, 8)),
            nerf_cfg, steps_per_epoch=1000, train_backend="fused")
        f_state = fsystem.init_state(jax.random.PRNGKey(3))
        for _ in range(5):
            f_state, m = fsystem.train_step(f_state, batch, key)
        float(m["train/loss"])
        t0 = time.perf_counter()
        for _ in range(20):
            f_state, m = fsystem.train_step(f_state, batch, key)
        float(m["train/loss"])
        fused_step_s = (time.perf_counter() - t0) / 20
    except Exception as e:  # pragma: no cover - bench resilience
        print(f"# fused train backend bench skipped: {e!r}", flush=True)

    # ---- BASELINE.md config 3: LLFF fern 504x378, NDC rays ---------------
    n_fern = 504 * 378
    d3 = rng.normal(size=(n_fern, 3)).astype(np.float32)
    d3[:, 2] = -np.abs(d3[:, 2]) - 0.5           # forward-facing
    fern_np = np.concatenate(
        [np.zeros((n_fern, 3), np.float32), d3,
         np.zeros((n_fern, 1), np.float32),      # NDC near=0
         np.ones((n_fern, 1), np.float32)], -1)  # NDC far=1
    fern_tiles = jnp.asarray(
        np.pad(fern_np, ((0, -n_fern % chunk), (0, 0))).reshape(-1, chunk, 8))

    @jax.jit
    def fern_frame(packed, tiles):
        rgb = jax.lax.map(
            lambda t: render_rays_fused(packed, t, render_cfg,
                                        nerf_cfg=nerf_cfg)["rgb_fine"], tiles)
        return jnp.sum(rgb)

    float(fern_frame(packed, fern_tiles))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        chk = fern_frame(packed, fern_tiles)
    float(chk)
    fern_rays_per_sec = fern_tiles.shape[0] * chunk * n_iters / (
        time.perf_counter() - t0) / n_chips

    # ---- BASELINE.md config 4: SIREN field + semantic (pointnet) steps ----
    siren_system = NeRFSystem(
        RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                     noise_std=1.0, white_back=True),
        TrainConfig(lr=5e-4, batch_size=1024, decay_step=(2, 4, 8)),
        nerf_cfg, steps_per_epoch=1000, field_type="siren")
    s_state = siren_system.init_state(jax.random.PRNGKey(5))
    s_state, m = siren_system.train_step(s_state, batch, key)
    float(m["train/loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        s_state, m = siren_system.train_step(s_state, batch, key)
    float(m["train/loss"])
    siren_step_s = (time.perf_counter() - t0) / 20

    from nerf_siren_tpu.training.semantic_system import NeRF3DSystem
    sem_system = NeRF3DSystem(
        RenderConfig(n_samples=64, n_importance=0, perturb=1.0, noise_std=1.0),
        TrainConfig(lr=5e-4, batch_size=4096, decay_step=(2,),
                    loss_type="msenll"),
        nerf_cfg, steps_per_epoch=1000,
        semantic_network="pointnet", n_classes=6, point_capacity=8192)
    sem_state = sem_system.init_state(jax.random.PRNGKey(6))
    sem_batch = {"rays": rays_np[:4096],
                 "rgbs": rng.uniform(0, 1, (4096, 3)).astype(np.float32),
                 "cls": rng.integers(0, 6, 4096)}
    sem_state, m = sem_system.train_step(sem_state, sem_batch, key)
    float(m["train/total_loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        sem_state, m = sem_system.train_step(sem_state, sem_batch, key)
    float(m["train/total_loss"])
    sem_step_s = (time.perf_counter() - t0) / 10

    # ---- BASELINE.md config 5: EG3D triplane renderer (reference 256^2) ---
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    eg3d_system = EG3DSystem(
        RenderConfig(), TrainConfig(lr=2e-3, batch_size=1024, decay_step=(8,)),
        steps_per_epoch=1000)
    e_state = eg3d_system.init_state(jax.random.PRNGKey(7))
    # camera-like rays (origins on a radius-4 shell, looking inward): the
    # triplane grid_sample gathers are data-dependent — isotropic random
    # directions scatter the plane accesses and cost ~200x (11 s/step vs
    # ~60 ms/step, measured), which no real workload exhibits
    eg3d_eyes = rng.normal(size=(65536, 3)).astype(np.float32)
    eg3d_eyes /= np.linalg.norm(eg3d_eyes, axis=-1, keepdims=True)
    eg3d_eyes *= 4.0
    eg3d_dirs = rng.normal(size=(65536, 3)).astype(np.float32) * 0.12 - eg3d_eyes / 4.0
    eg3d_dirs /= np.linalg.norm(eg3d_dirs, axis=-1, keepdims=True)
    eg3d_rays = np.concatenate([eg3d_eyes, eg3d_dirs], -1)
    e_batch = {"rays": eg3d_rays[:1024],
               "rgbs": rng.uniform(0, 1, (1024, 3)).astype(np.float32)}
    # the tunneled runtime re-optimizes this program over its first ~20
    # executions (5.7 s/step -> 62 ms/step measured); warm past that
    for _ in range(25):
        e_state, m = eg3d_system.train_step(e_state, e_batch, key)
    float(m["train/loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        e_state, m = eg3d_system.train_step(e_state, e_batch, key)
    float(m["train/loss"])
    eg3d_step_s = (time.perf_counter() - t0) / 20

    # device-resident params: a render loop uploads weights once, not per
    # frame (host-resident params cost ~2 s/frame in H2D over the tunnel)
    eg3d_params = e_state.params
    for _ in range(4):  # warm the render program past runtime re-optimization
        out = eg3d_system.render(eg3d_params, eg3d_rays)
    t0 = time.perf_counter()
    out = eg3d_system.render(eg3d_params, eg3d_rays)
    float(np.sum(out["rgb_fine"][:8]))
    eg3d_rays_per_sec = 65536 / (time.perf_counter() - t0) / n_chips

    # EG3D proxy-culled fast renderer (render/triplane_fast.py): K plane
    # samples/ray instead of 64+64. Throughput only — agreement quality is
    # measured on a TRAINED scene (docs/status.md: 30.0 dB @ K=16 vs the
    # exact render); this bench scene is 45-step random-ish density.
    from nerf_siren_tpu.render.triplane_fast import make_fast_eg3d_renderer
    eg3d_fast = make_fast_eg3d_renderer(
        eg3d_params["eg3d_renderer"], eg3d_system.cfg,
        n_candidates=32, n_keep=16, distill_steps=150,
        rng=jax.random.PRNGKey(11))
    eg3d_rays_j = jnp.asarray(eg3d_rays)
    for _ in range(25):  # past the tunneled runtime's re-optimization phase
        out = eg3d_fast(eg3d_rays_j)
        float(jnp.sum(out["rgb_fine"][:4]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = eg3d_fast(eg3d_rays_j)
        float(jnp.sum(out["rgb_fine"][:4]))
    eg3d_fast_rays_per_sec = 3 * 65536 / (time.perf_counter() - t0) / n_chips

    print(json.dumps({
        "metric": "rays_per_sec_per_chip_lego800_coarse_fine",
        "value": round(value, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(value / 5e6, 4),
        "secondary": {
            "fast_path_conservative_rays_per_sec": round(fast_hi_q, 1),
            "fast_path_aggressive_rays_per_sec": round(fast_fast, 1),
            "fast_path_culled_32db_rays_per_sec": round(fast_cull, 1),
            "fast_path_note": "proxy-culled renderer (render/fast.py): "
                              "fused Pallas proxy-march kernel (rotation-"
                              "recurrence march + pdf select in VMEM, "
                              "ops/pallas/proxy_march.py) + fused Pallas "
                              "model eval + phantom-suppressed proxy; "
                              "conservative=32cand/keep16 (32.04dB "
                              "agreement with the exact render on a "
                              "converged scene), aggressive=32/8 "
                              "(29.7dB), culled=32/16/cull0.65 "
                              "(32.04dB, the >=5M @ >=32dB operating "
                              "point: 5.88M measured on the frontier "
                              "scene) — full curve in BASELINE.md / "
                              "docs/fast_frontier.json",
            "exact_jnp_rays_per_sec": round(jnp_rays_per_sec, 1),
            "p50_full_frame_latency_s": round(dt / n_iters, 4),
            "fast_p50_frame_latency_conservative_s": round(fast_hi_q_lat, 4),
            "fast_p50_frame_latency_aggressive_s": round(fast_fast_lat, 4),
            "fast_p50_frame_latency_culled_s": round(fast_cull_lat, 4),
            "train_step_s_batch1024_64c128f": round(train_step_s, 4),
            "train_step_fused_backend_s": (round(fused_step_s, 4)
                                           if fused_step_s else None),
            "train_step_note": "reference reports 0.12 s/step for the same "
                               "recipe on one RTX 2080 Ti (README.md:138-144)",
            "cfg3_fern_ndc_rays_per_sec": round(fern_rays_per_sec, 1),
            "cfg4_siren_train_step_s": round(siren_step_s, 4),
            "cfg4_semantic_pointnet_step_s_batch4096_cap8192": round(sem_step_s, 4),
            "cfg5_eg3d_train_step_s_batch1024_256sq_planes": round(eg3d_step_s, 4),
            "cfg5_eg3d_render_rays_per_sec": round(eg3d_rays_per_sec, 1),
            "cfg5_eg3d_fast_render_rays_per_sec": round(eg3d_fast_rays_per_sec, 1),
        },
    }))


if __name__ == "__main__":
    main()
