"""PSNR parity protocol: this framework vs the torch reference pipeline.

BASELINE.md demands PSNR within ±0.1 dB of the PyTorch reference. No real
Blender/LLFF data (or reference-trained checkpoint) exists in this
environment, so this tool builds the strongest available substitute, end to
end on one machine:

1. train the reference recipe (8x256 NeRF, 64+64 samples, lr 5e-4) on the
   analytic 3-sphere scene (tools/fast_frontier.py's scene),
2. export the trained weights as a REFERENCE-FORMAT torch checkpoint
   (`nerf_coarse.xyz_encoding_1.0.weight`, ... — the naming of reference
   utils/__init__.py:56-71), torch.save'd like a Lightning checkpoint,
3. re-import it through tools/import_torch_ckpt.py (validating the importer
   round-trip a reference user would run),
4. render held-out poses through (a) the torch oracle — the ENTIRE reference
   render pipeline re-derived in torch from models/rendering.py:70-262 — and
   (b) this framework's renderers (jnp f32, jnp bf16, fused Pallas kernel),
   all from the round-tripped weights,
5. report per-pose PSNR vs the analytic ground truth for every backend and
   the delta against the torch reference number.

If every |delta| is well under 0.1 dB, any PSNR the reference would report
on shared data is matched within the bar, independent of the scene content.

Run: python tools/psnr_parity.py [--hw 128 --poses 3 --steps 2000]
Writes docs/psnr_parity.json and prints a markdown table for BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fast_frontier import look_at, make_rays, trace_gt  # noqa: E402


def export_torch_ckpt(params, path):
    """JAX param pytree -> reference-format Lightning checkpoint."""
    import torch

    state = {}
    for model, name in (("coarse", "nerf_coarse"), ("fine", "nerf_fine")):
        p = params[model]

        def put(prefix, lin_p):
            state[f"{name}.{prefix}.weight"] = torch.tensor(
                np.asarray(lin_p["kernel"], np.float32).T.copy())
            state[f"{name}.{prefix}.bias"] = torch.tensor(
                np.asarray(lin_p["bias"], np.float32).copy())

        for i, layer in enumerate(p["xyz_layers"]):
            put(f"xyz_encoding_{i + 1}.0", layer)
        put("xyz_encoding_final", p["xyz_final"])
        put("sigma", p["sigma"])
        put("dir_encoding.0", p["dir_layer"])
        put("rgb.0", p["rgb"])
    torch.save({"state_dict": state}, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=128)
    ap.add_argument("--poses", type=int, default=3)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--train_hw", type=int, default=160)
    ap.add_argument("--out", type=str, default="docs/psnr_parity.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.ops.pallas.fused_mlp import pack_model_params
    from nerf_siren_tpu.render.fused import render_rays_fused
    from nerf_siren_tpu.render.rendering import render_rays_chunked
    from nerf_siren_tpu.training.checkpoints import load_ckpt
    from nerf_siren_tpu.training.system import NeRFSystem
    from tests.test_torch_parity import torch_render
    from tools.import_torch_ckpt import import_torch_ckpt

    # ---- 1. train the reference recipe on the analytic scene --------------
    hw = args.train_hw
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911112) * hw / 800
    views = []
    for k in range(12):
        phi = 2 * np.pi * k / 12
        eye = 4.0 * np.array([np.cos(phi) * np.cos(0.4),
                              np.sin(phi) * np.cos(0.4), np.sin(0.4)])
        rays = make_rays(look_at(eye), eye, hw, hw, focal)
        views.append((rays, trace_gt(rays[:, 0:3], rays[:, 3:6])))
    all_rays = np.concatenate([v[0] for v in views])
    all_rgbs = np.concatenate([v[1] for v in views])

    nerf_cfg = NeRFConfig()
    system = NeRFSystem(
        RenderConfig(n_samples=64, n_importance=64, perturb=1.0, noise_std=1.0,
                     white_back=True),
        TrainConfig(lr=5e-4, batch_size=4096, decay_step=(100,)),
        nerf_cfg, steps_per_epoch=args.steps)
    state = system.init_state(jax.random.PRNGKey(0))
    t0 = time.time()
    done = 0
    while done < args.steps:
        n_chunk = min(500, args.steps - done)
        state, m = system.train_scan(state, all_rays, all_rgbs,
                                     jax.random.PRNGKey(done), n_chunk)
        done += n_chunk
    print(f"trained {args.steps} steps in {time.time()-t0:.0f}s, "
          f"train psnr {float(m['train/psnr']):.2f} dB", flush=True)

    # ---- 2-3. torch-format export -> importer round-trip ------------------
    os.makedirs("docs", exist_ok=True)
    export_torch_ckpt(jax.device_get(state.params), "/tmp/parity_ref.ckpt")
    import_torch_ckpt("/tmp/parity_ref.ckpt", "/tmp/parity_imported.msgpack")
    params = {
        "coarse": load_ckpt(init_nerf(jax.random.PRNGKey(0), nerf_cfg),
                            "/tmp/parity_imported.msgpack", "nerf_coarse"),
        "fine": load_ckpt(init_nerf(jax.random.PRNGKey(1), nerf_cfg),
                          "/tmp/parity_imported.msgpack", "nerf_fine"),
    }
    packed = pack_model_params(params, nerf_cfg)

    # ---- 4. render held-out poses through every backend -------------------
    H = W = args.hw
    focal_e = 0.5 * 800 / np.tan(0.5 * 0.6911112) * H / 800
    # torch oracle is a FULL (non-test_time) render; match it exactly
    jcfg = RenderConfig(n_samples=64, n_importance=64, perturb=0.0,
                        noise_std=0.0, white_back=True, test_time=False,
                        chunk=H * W)
    fcfg = jcfg.replace(test_time=True)

    def psnr(a, b):
        return float(-10 * np.log10(np.mean(
            (np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
            + 1e-12))

    rows = []
    for p in range(args.poses):
        ang = 0.7 + 1.9 * p
        eye = 4.0 * np.array([np.cos(ang) * np.cos(-0.2),
                              np.sin(ang) * np.cos(-0.2), np.sin(-0.2)])
        rays = make_rays(look_at(eye), eye, H, W, focal_e)
        gt = trace_gt(rays[:, 0:3], rays[:, 3:6])

        t0 = time.time()
        with torch.no_grad():
            oracle = torch_render(params, torch.tensor(rays), 64, 64,
                                  True)["rgb_fine"].numpy()
        t_oracle = time.time() - t0
        jf32 = render_rays_chunked(params, jnp.asarray(rays), jcfg, None,
                                   nerf_cfg=nerf_cfg)["rgb_fine"]
        jbf16 = render_rays_chunked(params, jnp.asarray(rays), jcfg, None,
                                    nerf_cfg=nerf_cfg,
                                    compute_dtype=jnp.bfloat16)["rgb_fine"]
        fused = render_rays_fused(packed, jnp.asarray(rays), fcfg,
                                  nerf_cfg=nerf_cfg)["rgb_fine"]

        p_oracle = psnr(oracle, gt)
        row = {"pose": p, "torch_oracle_psnr": p_oracle,
               "torch_oracle_s": t_oracle}
        for name, img in (("jnp_f32", jf32), ("jnp_bf16", jbf16),
                          ("fused", fused)):
            row[f"{name}_psnr"] = psnr(img, gt)
            row[f"{name}_delta_db"] = row[f"{name}_psnr"] - p_oracle
            row[f"{name}_agreement_db"] = psnr(img, oracle)
        rows.append(row)
        print(f"pose {p}: torch {p_oracle:.3f} dB | " + " | ".join(
            f"{n} Δ{rows[-1][f'{n}_delta_db']:+.4f} dB "
            f"(agree {rows[-1][f'{n}_agreement_db']:.1f} dB)"
            for n in ("jnp_f32", "jnp_bf16", "fused")), flush=True)

    # NOTE: the fused renderer is test_time (σ-only coarse); its FINE output
    # is identical math to the full render's fine pass, which is what the
    # table compares. (test_time changes only the coarse rgb outputs.)

    with open(args.out, "w") as f:
        json.dump({"hw": args.hw, "steps": args.steps, "rows": rows}, f, indent=1)
    print(f"wrote {args.out}", flush=True)

    print("\n| pose | torch PSNR | jnp f32 Δ | jnp bf16 Δ | fused Δ | fused agree |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['pose']} | {r['torch_oracle_psnr']:.3f} | "
              f"{r['jnp_f32_delta_db']:+.4f} | {r['jnp_bf16_delta_db']:+.4f} | "
              f"{r['fused_delta_db']:+.4f} | {r['fused_agreement_db']:.1f} dB |")


if __name__ == "__main__":
    main()
