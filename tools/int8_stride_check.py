"""On-chip sweep of the int8 dynamic-reduce stride lever (VERDICT r4 item 6).

For DYN_STRIDE x DYN_SAFETY combinations: (a) raw kernel throughput
(fused_full_t_int8 vs the bf16 fused_full_t, same protocol as
tools/int8_kernel_bench.py), (b) rendered agreement of the int8 fused
render vs the bf16 fused render on the TRAINED cluster field (pose 0,
--hw, exact pipeline) — saturation from a too-coarse sampled absmax shows
up directly as agreement loss.

Writes docs/int8_stride.json.
Run (chip): python tools/int8_stride_check.py [--hw 400]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fast_frontier import SCENES, look_at, make_rays  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=400)
    ap.add_argument("--scene", type=str, default="cluster")
    ap.add_argument("--n_points", type=int, default=2 * 1024 * 1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig
    from nerf_siren_tpu.ops.pallas import fused_mlp, fused_mlp_int8
    from nerf_siren_tpu.render.fused import render_rays_fused
    from nerf_siren_tpu.training.checkpoints import load_checkpoint

    blob = load_checkpoint(f"/tmp/frontier_scene_{args.scene}.msgpack")
    params = blob["params"]
    nerf_cfg = NeRFConfig()
    packed = fused_mlp.pack_model_params(params, nerf_cfg)
    packed8 = fused_mlp_int8.pack_model_params_int8(params, nerf_cfg)

    # kernel-throughput operands (int8_kernel_bench protocol)
    n = args.n_points
    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (fused_mlp.IN_ROWS, n), jnp.float32,
                             minval=-2.0, maxval=2.0).at[3:].set(0.0)
    d = jax.random.normal(jax.random.fold_in(key, 1),
                          (fused_mlp.IN_ROWS, n))
    d = (d / jnp.linalg.norm(d[:3], axis=0, keepdims=True)).at[3:].set(0.0)

    def bench(fn, pk):
        f = jax.jit(lambda x, dd: jnp.sum(fn(pk, x, dd)))
        for _ in range(25):
            chk = f(xyz, d)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(30):
            chk = f(xyz, d)
        float(chk)
        return n * 30 / (time.perf_counter() - t0)

    # render-agreement frame (pose 0 of the frontier protocol)
    hw = args.hw
    focal = 0.5 * hw / np.tan(0.5 * 0.6911112)
    eye = 4.0 * np.array([np.cos(1.1) * np.cos(-0.25),
                          np.sin(1.1) * np.cos(-0.25), np.sin(-0.25)])
    rays = make_rays(look_at(eye), eye, hw, hw, focal)
    tiles = jnp.asarray(rays.reshape(-1, 40_000 if hw == 800 else hw * hw // 4,
                                     8))
    cfg = RenderConfig(n_samples=64, n_importance=64, perturb=0.0,
                       noise_std=0.0, white_back=True, test_time=True)

    def frame(pk):
        @jax.jit
        def f(tl):
            return jax.lax.map(
                lambda t: render_rays_fused(pk, t, cfg,
                                            nerf_cfg=nerf_cfg)["rgb_fine"],
                tl)
        return np.asarray(f(tiles)).reshape(-1, 3)

    ref = frame(packed)
    bf16_rate = bench(fused_mlp.fused_full_t, packed["fine"])
    print(f"bf16 kernel: {bf16_rate/1e6:7.1f} Mpts/s", flush=True)

    results = {"bf16_mpts": bf16_rate / 1e6, "hw": hw, "rows": []}
    for stride, safety in ((1, 1.0), (2, 1.0), (4, 1.0), (8, 1.0),
                           (4, 1.25), (8, 1.25)):
        fused_mlp_int8.DYN_STRIDE = stride
        fused_mlp_int8.DYN_SAFETY = safety
        try:
            rate = bench(fused_mlp_int8.fused_full_t_int8, packed8["fine"])
            rgb = frame(packed8)
            agree = float(-10 * np.log10(np.mean((rgb - ref) ** 2) + 1e-12))
            row = {"stride": stride, "safety": safety,
                   "mpts": rate / 1e6, "ratio_vs_bf16": rate / bf16_rate,
                   "agreement_db_vs_bf16_render": agree}
            print(f"stride={stride} safety={safety}: {rate/1e6:7.1f} Mpts/s "
                  f"({rate/bf16_rate:.2f}x bf16)  agree {agree:6.2f} dB",
                  flush=True)
        except Exception as e:
            row = {"stride": stride, "safety": safety, "error": str(e)[:300]}
            print(f"stride={stride} safety={safety}: FAILED {e}", flush=True)
        results["rows"].append(row)
    fused_mlp_int8.DYN_STRIDE = 1
    fused_mlp_int8.DYN_SAFETY = 1.0

    with open("docs/int8_stride.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote docs/int8_stride.json", flush=True)


if __name__ == "__main__":
    main()
