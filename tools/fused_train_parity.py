"""Fused-train-backend convergence parity + end-to-end step time (on-chip).

The round-2 fused Pallas training kernels (ops/pallas/fused_mlp_train.py)
are grad-parity-tested at the kernel level, but a kernel microbenchmark is
not a training speedup: this tool trains the SAME scene with
train_backend='jnp' and 'fused' (identical data, seeds, and batch
sampling — train_scan keys only depend on the PRNG key and step), then

1. renders the same held-out frame from both sets of final weights with
   the SAME exact renderer (isolates the training-path difference),
2. reports PSNR vs the analytic GT for both + the delta (parity bar:
   |delta| <= 0.1 dB, the BASELINE.md PSNR-parity standard),
3. reports the measured end-to-end wall-clock per step for both backends
   at the training recipe (batch 4096, 64 coarse + 64 fine — the frontier
   recipe; the reference-recipe step times live in bench.py).

Replaces the "pending" end-to-end claim in docs/status.md:77-79.
Reference hot loop being replaced: /root/reference/models/rendering.py:140-190.

Run: python tools/fused_train_parity.py [--steps 10000]
Writes docs/fused_train_parity.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fast_frontier import SCENES, look_at, make_rays, trace_gt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--train_hw", type=int, default=160)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--scene", type=str, default="spheres",
                    choices=sorted(SCENES))
    ap.add_argument("--batch_size", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0,
                    help="init + batch-sampling seed; run the SAME backend "
                         "at two seeds to measure the run-to-run noise band "
                         "the +-0.1 dB parity bar should be read against")
    ap.add_argument("--backends", type=str, nargs="+",
                    default=["jnp", "fused"],
                    help="any of jnp/fused/culled/culled_fused — every "
                         "non-jnp backend is scored against jnp when both "
                         "run")
    ap.add_argument("--out", type=str, default="docs/fused_train_parity.json")
    args = ap.parse_args()
    spheres = SCENES[args.scene]

    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
    from nerf_siren_tpu.ops.pallas.fused_mlp import pack_model_params
    from nerf_siren_tpu.render.fused import render_rays_fused
    from nerf_siren_tpu.training.system import NeRFSystem

    # training data: same construction as tools/fast_frontier.py
    hw = args.train_hw
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911112) * hw / 800
    views = []
    for k in range(args.views):
        phi = 2 * np.pi * k / args.views
        elev = 0.15 + 0.5 * (k % 3)
        eye = 4.0 * np.array([np.cos(phi) * np.cos(elev),
                              np.sin(phi) * np.cos(elev), np.sin(elev)])
        rays = make_rays(look_at(eye), eye, hw, hw, focal)
        views.append((rays, trace_gt(rays[:, 0:3], rays[:, 3:6], spheres)))
    all_rays = np.concatenate([v[0] for v in views])
    all_rgbs = np.concatenate([v[1] for v in views])

    # held-out 400^2 eval frame
    H = W = 400
    focal_e = 0.5 * 800 / np.tan(0.5 * 0.6911112) * H / 800
    eye = 4.0 * np.array([np.cos(1.1) * np.cos(-0.25),
                          np.sin(1.1) * np.cos(-0.25), np.sin(-0.25)])
    rays_e = make_rays(look_at(eye), eye, H, W, focal_e)
    gt_e = trace_gt(rays_e[:, 0:3], rays_e[:, 3:6], spheres)
    tiles_e = jnp.asarray(rays_e.reshape(-1, 40_000, 8))

    nerf_cfg = NeRFConfig()
    exact_cfg = RenderConfig(n_samples=64, n_importance=64, perturb=0.0,
                             noise_std=0.0, white_back=True, test_time=True)

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    results = {"steps": args.steps, "batch_size": args.batch_size,
               "scene": args.scene, "seed": args.seed, "backends": {}}
    for backend in args.backends:
        system = NeRFSystem(
            RenderConfig(n_samples=64, n_importance=64, perturb=1.0,
                         noise_std=1.0, white_back=True),
            TrainConfig(lr=5e-4, batch_size=args.batch_size,
                        decay_step=(100,), num_epochs=1),
            nerf_cfg, steps_per_epoch=args.steps, train_backend=backend)
        state = system.init_state(jax.random.PRNGKey(args.seed))
        chunk = 500
        done = 0
        t0 = time.time()
        chunk_times = []
        while done < args.steps:
            n = min(chunk, args.steps - done)
            tc = time.perf_counter()
            state, m = system.train_scan(
                state, all_rays, all_rgbs,
                jax.random.PRNGKey(done + args.seed * 1000003), n)
            float(m["train/loss"])          # host fetch = reliable sync
            chunk_times.append((time.perf_counter() - tc) / n)
            done += n
            if done % 2500 == 0 or done == args.steps:
                print(f"  [{backend}] step {done}: train psnr "
                      f"{float(m['train/psnr']):.2f} dB", flush=True)
        wall = time.time() - t0
        # steady-state step time: median of post-warmup chunks (first chunk
        # carries the compile; early chunks carry tunnel re-optimization)
        steady = float(np.median(chunk_times[2:])) if len(chunk_times) > 3 \
            else float(chunk_times[-1])

        packed = pack_model_params(jax.device_get(state.params), nerf_cfg)

        @jax.jit
        def eval_frame(tiles):
            rgb = jax.lax.map(
                lambda t: render_rays_fused(packed, t, exact_cfg,
                                            nerf_cfg=nerf_cfg)["rgb_fine"],
                tiles)
            return rgb, jnp.sum(rgb)

        rgb, chk = eval_frame(tiles_e)
        float(chk)
        p = psnr(np.asarray(rgb).reshape(-1, 3), gt_e)
        results["backends"][backend] = {
            "train_psnr": float(m["train/psnr"]),
            "eval_psnr_vs_gt": p,
            "steady_step_s": steady,
            "wall_s": wall,
        }
        print(f"[{backend}] eval PSNR vs GT: {p:.3f} dB, steady step "
              f"{steady*1e3:.1f} ms, wall {wall:.0f}s", flush=True)

    if "jnp" in results["backends"]:
        base = results["backends"]["jnp"]
        for name, b in results["backends"].items():
            if name == "jnp":
                continue
            d = b["eval_psnr_vs_gt"] - base["eval_psnr_vs_gt"]
            sp = base["steady_step_s"] / b["steady_step_s"]
            b["psnr_delta_vs_jnp_db"] = d
            b["speedup_vs_jnp"] = sp
            b["not_worse"] = bool(d >= -0.1)
            print(f"\nPSNR delta ({name} - jnp): {d:+.3f} dB "
                  f"(not-worse at -0.1 dB: {d >= -0.1}), "
                  f"{name} end-to-end speedup: {sp:.2f}x", flush=True)
        if "fused" in results["backends"]:   # round-2 summary keys (kept)
            f = results["backends"]["fused"]
            results["psnr_delta_db"] = f["psnr_delta_vs_jnp_db"]
            results["fused_speedup"] = f["speedup_vs_jnp"]
            results["parity_ok"] = bool(abs(f["psnr_delta_vs_jnp_db"]) <= 0.1)
            results["fused_not_worse"] = f["not_worse"]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
