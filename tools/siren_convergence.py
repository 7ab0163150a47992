"""SIREN field convergence evidence (on-chip).

SIREN/FiLM was the one field type with a step time but zero quality
numbers (round-2 verdict). This trains the frontier scene with
field_type='siren' (and 'mlp' for a same-protocol anchor), renders the
same held-out 400^2 pose from both, and records PSNR vs the analytic GT
plus the steady step time. Reference: /root/reference/models/nerf.py:126-215
(SemanticNeRF/FiLMLayer — shipped dead there; wired here).

Run: python tools/siren_convergence.py [--steps 10000]
Writes docs/siren_convergence.json.
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
    ap.add_argument("--fields", type=str, nargs="+", default=["siren", "mlp"])
    ap.add_argument("--out", type=str, default="docs/siren_convergence.json")
    args = ap.parse_args()
    spheres = SCENES[args.scene]

    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
    from nerf_siren_tpu.training.system import NeRFSystem

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

    H = W = 400
    focal_e = 0.5 * 800 / np.tan(0.5 * 0.6911112) * H / 800
    eye = 4.0 * np.array([np.cos(1.1) * np.cos(-0.25),
                          np.sin(1.1) * np.cos(-0.25), np.sin(-0.25)])
    rays_e = make_rays(look_at(eye), eye, H, W, focal_e)
    gt_e = trace_gt(rays_e[:, 0:3], rays_e[:, 3:6], spheres)

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    results = {"steps": args.steps, "scene": args.scene, "fields": {}}
    for field in args.fields:
        system = NeRFSystem(
            RenderConfig(n_samples=64, n_importance=64, perturb=1.0,
                         noise_std=1.0, white_back=True),
            TrainConfig(lr=5e-4, batch_size=4096, decay_step=(100,),
                        num_epochs=1),
            NeRFConfig(), steps_per_epoch=args.steps, field_type=field)
        state = system.init_state(jax.random.PRNGKey(0))
        chunk, done, chunk_times = 500, 0, []
        while done < args.steps:
            n = min(chunk, args.steps - done)
            tc = time.perf_counter()
            state, m = system.train_scan(state, all_rays, all_rgbs,
                                         jax.random.PRNGKey(done), n)
            float(m["train/loss"])
            chunk_times.append((time.perf_counter() - tc) / n)
            done += n
            if done % 2500 == 0 or done == args.steps:
                print(f"  [{field}] step {done}: train psnr "
                      f"{float(m['train/psnr']):.2f} dB", flush=True)
        steady = float(np.median(chunk_times[2:])) if len(chunk_times) > 3 \
            else float(chunk_times[-1])
        out = system.render(state.params, rays_e)
        p = psnr(np.asarray(out["rgb_fine"]).reshape(-1, 3), gt_e)
        results["fields"][field] = {
            "train_psnr": float(m["train/psnr"]),
            "eval_psnr_vs_gt": p,
            "steady_step_s": steady,
        }
        print(f"[{field}] eval PSNR vs GT: {p:.2f} dB, steady step "
              f"{steady*1e3:.1f} ms", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
