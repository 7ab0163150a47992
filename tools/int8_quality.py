"""Quality probe: what does int8 trunk quantization cost the NeRF field?

Motivation: BASELINE.md's FLOP-arithmetic section shows every dense
(~40%+-foreground) frame is compute-bound past ~4.7M rays/s at 32 dB for
any renderer that evaluates the full 8x256 field in bf16 — the MXU's int8
path is the only lever left (measured in-kernel: int8 chain 2.4-2.8x the
bf16 chain, see docs/status.md round-3 notes). This probe measures what
that quantization costs in rendered quality BEFORE building the kernel.

Protocol: train (or reuse) the frontier spheres scene, render one held-out
400^2 pose with the exact f32 path, then re-render with the FINE full-pass
trunk replaced by a fake-quantized version (weights int8 per-output-channel;
activations int8 under several scale schemes), same sample placement.
Reports agreement PSNR of each variant vs the f32 frame and vs GT.

Schemes (each realizable in a Pallas int8 kernel that splits the skip
concat into separate matmuls, so each operand gets its own scale):
  wonly  : int8 weights, f32 activations (isolates weight quant)
  static : + int8 activations, per-tensor absmax scale (calibrated)
  p999   : + int8 activations, per-tensor 99.9th-percentile scale
  dyn    : + int8 activations, per-point (per-row) dynamic absmax scale

Reference context: the trunk being quantized is the reference's 8x256 NeRF
MLP (/root/reference/models/nerf.py:41-124); its heads (sigma/rgb, <10% of
FLOPs) stay full precision.

Run: python tools/int8_quality.py  [STEPS=20000 CKPT=... EVAL_H=400 env]
Writes docs/int8_quality.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.fast_frontier import SCENES, look_at, make_rays, trace_gt  # noqa

import jax  # noqa
import jax.numpy as jnp  # noqa

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig  # noqa
from nerf_siren_tpu.models.embedding import positional_encoding  # noqa
from nerf_siren_tpu.models.nerf import apply_nerf  # noqa
from nerf_siren_tpu.models.layers import linear  # noqa
from nerf_siren_tpu.render.rendering import render_rays  # noqa
from nerf_siren_tpu.training.system import NeRFSystem  # noqa
from nerf_siren_tpu.training.checkpoints import (load_checkpoint,  # noqa
                                                 save_checkpoint)

SCENE = os.environ.get("SCENE", "spheres")
STEPS = int(os.environ.get("STEPS", "20000"))
CKPT = os.environ.get("CKPT", f"/tmp/frontier_scene_{SCENE}.msgpack")
cfg = NeRFConfig()
EMB_X = 63  # 3 * (2*10 + 1)


def quant_w(w):
    """Per-output-channel symmetric int8 fake-quant (w: (in, out))."""
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    return jnp.round(w / s).clip(-127, 127) * s


def quant_a(a, s):
    """Fake-quant activations with scale s (value of int level 1)."""
    s = jnp.maximum(s, 1e-12)
    return jnp.round(jnp.clip(a / s, -127, 127)) * s


def trunk_operands(params_fine, xyz_flat):
    """Replicate the trunk, returning each matmul operand keyed the way the
    quant field consumes it. Pure jnp (jittable)."""
    emb = positional_encoding(xyz_flat, 10)
    x, e = emb[:, :3], emb[:, 3:]
    acts = {"x": x, "e": e}
    h = None
    for i in range(cfg.depth):
        L = params_fine["xyz_layers"][i]
        w = L["kernel"]
        if i == 0:
            y = x @ w[:3] + e @ w[3:]
        elif i in cfg.skips:
            acts[f"h{i}"] = h
            y = x @ w[:3] + e @ w[3:EMB_X] + h @ w[EMB_X:]
        else:
            acts[f"h{i}"] = h
            y = h @ w
        h = jax.nn.relu(y + L["bias"])
    return acts


def make_quant_field(params_fine, scheme, act_scales):
    """Fake-quant full-pass eval of the fine net (field_fn contract of
    render_rays). act_scales: per-operand static scales (unused for
    wonly/dyn)."""
    qw = {i: quant_w(params_fine["xyz_layers"][i]["kernel"])
          for i in range(cfg.depth)}

    def qa(a, key):
        if scheme == "wonly":
            return a
        if scheme == "dyn":
            s = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0
            return quant_a(a, s)
        # 'chan': per-channel static absmax vector (C,) — realizable at
        # ZERO kernel cost by folding the channel scales into the next
        # layer's weight columns (ops/pallas/fused_mlp_int8.py does
        # exactly this); 'static'/'p999' use one per-tensor scalar
        return quant_a(a, act_scales[key] / 127.0)

    def field(p, xyz, dir_emb):
        r, samp, _ = xyz.shape
        flat = xyz.reshape(-1, 3)
        if dir_emb is None:
            # placement pass stays exact to isolate full-eval quantization
            emb = positional_encoding(flat, 10)
            return apply_nerf(p, emb, None, cfg=cfg).reshape(r, samp, 1)
        emb = positional_encoding(flat, 10)
        x, e = emb[:, :3], emb[:, 3:]
        h = None
        for i in range(cfg.depth):
            L = p["xyz_layers"][i]
            w = qw[i]
            if i == 0:
                y = qa(x, "x") @ w[:3] + qa(e, "e") @ w[3:]
            elif i in cfg.skips:
                y = (qa(x, "x") @ w[:3] + qa(e, "e") @ w[3:EMB_X]
                     + qa(h, f"h{i}") @ w[EMB_X:])
            else:
                y = qa(h, f"h{i}") @ w
            h = jax.nn.relu(y + L["bias"])
        # heads stay full precision (<10% of the FLOPs)
        sigma = linear(p["sigma"], h)
        feat = linear(p["xyz_final"], h)
        de = jnp.broadcast_to(dir_emb[:, None, :],
                              (r, samp, dir_emb.shape[-1])).reshape(
                                  -1, dir_emb.shape[-1])
        hd = jnp.concatenate([feat, de], axis=-1)
        hd = jax.nn.relu(linear(p["dir_layer"], hd))
        rgb = jax.nn.sigmoid(linear(p["rgb"], hd))
        return jnp.concatenate([rgb, sigma], -1).reshape(r, samp, 4)

    return field


def main():
    spheres = SCENES[SCENE]
    hw, n_views = 160, 24
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911112) * hw / 800
    views = []
    for k in range(n_views):
        phi = 2 * np.pi * k / n_views
        elev = 0.15 + 0.5 * (k % 3)
        eye = 4.0 * np.array([np.cos(phi) * np.cos(elev),
                              np.sin(phi) * np.cos(elev), np.sin(elev)])
        rays = make_rays(look_at(eye), eye, hw, hw, focal)
        views.append((rays, trace_gt(rays[:, 0:3], rays[:, 3:6], spheres)))
    all_rays = np.concatenate([v[0] for v in views])
    all_rgbs = np.concatenate([v[1] for v in views])

    if os.path.exists(CKPT):
        blob = load_checkpoint(CKPT)
        params = blob["params"]
        print(f"reusing {CKPT} (train psnr "
              f"{float(np.asarray(blob['train_psnr'])):.2f})", flush=True)
    else:
        system = NeRFSystem(
            RenderConfig(n_samples=64, n_importance=64, perturb=1.0,
                         noise_std=1.0, white_back=True),
            TrainConfig(lr=5e-4, batch_size=4096, decay_step=(100,),
                        num_epochs=1), cfg, steps_per_epoch=STEPS)
        state = system.init_state(jax.random.PRNGKey(0))
        t0, done = time.time(), 0
        while done < STEPS:
            n = min(500, STEPS - done)
            state, m = system.train_scan(state, all_rays, all_rgbs,
                                         jax.random.PRNGKey(done), n)
            float(m["train/loss"])
            done += n
            if done % 5000 == 0:
                print(f"  step {done}: {float(m['train/psnr']):.2f} dB "
                      f"({(time.time()-t0)/done*1e3:.0f} ms/step)", flush=True)
        params = jax.device_get(state.params)
        from nerf_siren_tpu.render.fast import distill_proxy

        def sigma_fn(pts):
            return apply_nerf(params["fine"], positional_encoding(pts, 10),
                              None, cfg=cfg)[:, 0]
        proxy = jax.device_get(distill_proxy(
            sigma_fn, [-2.2] * 3, [2.2] * 3, jax.random.PRNGKey(5)))
        save_checkpoint(CKPT, {"params": params, "proxy": proxy,
                               "train_psnr": np.float32(float(m["train/psnr"]))})
        print(f"saved scene to {CKPT}", flush=True)

    # held-out pose (outside training rings)
    H = int(os.environ.get("EVAL_H", "400"))
    focal_e = 0.5 * 800 / np.tan(0.5 * 0.6911112) * H / 800
    eye = 4.0 * np.array([np.cos(1.1) * np.cos(-0.25),
                          np.sin(1.1) * np.cos(-0.25), np.sin(-0.25)])
    rays = make_rays(look_at(eye), eye, H, H, focal_e)
    gt = trace_gt(rays[:, 0:3], rays[:, 3:6], spheres)

    rcfg = RenderConfig(n_samples=64, n_importance=64, perturb=0.0,
                        noise_std=0.0, white_back=True, test_time=True)

    def render_frame(field_fn, chunk=40000):
        # one compiled program per scheme; fixed-size ray chunks (pad last)
        fn = jax.jit(lambda p, r: render_rays(p, r, rcfg,
                                              field_fn=field_fn)["rgb_fine"])
        outs = []
        r = np.asarray(rays, np.float32)
        n = r.shape[0]
        pad = -n % chunk
        r = np.concatenate([r, np.repeat(r[-1:], pad, 0)]) if pad else r
        for i in range(0, r.shape[0], chunk):
            outs.append(np.asarray(fn(params, jnp.asarray(r[i:i + chunk]))))
        return np.concatenate(outs)[:n]

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    exact = render_frame(None)
    p_exact = psnr(exact, gt)
    print(f"exact vs GT: {p_exact:.2f} dB", flush=True)

    # Calibrate static activation scales from stratified samples along a
    # subset of the eval rays (trunk acts depend on xyz only). One jitted
    # stats pass — no eager per-op dispatches on the tunnel.
    sub = np.asarray(rays)[:: max(1, rays.shape[0] // 8192)]
    z = np.linspace(0, 1, 64, dtype=np.float32)
    xyz = (sub[:, None, 0:3] + sub[:, None, 3:6]
           * (sub[:, None, 6:7] * (1 - z[None, :, None])
              + sub[:, None, 7:8] * z[None, :, None])).reshape(-1, 3)

    @jax.jit
    def act_stats(p, pts):
        acts = trunk_operands(p, pts)
        return {k: (jnp.max(jnp.abs(v)),
                    jnp.percentile(jnp.abs(v).ravel(), 99.9),
                    jnp.max(jnp.abs(v), axis=0))  # per-channel absmax
                for k, v in acts.items()}

    stats = jax.device_get(act_stats(params["fine"], jnp.asarray(xyz)))
    calib = {k: [float(v[0]), float(v[1])] for k, v in stats.items()}
    chan = {k: np.asarray(v[2], np.float32) for k, v in stats.items()}
    print("act calib (absmax, p99.9):",
          {k: [round(v[0], 3), round(v[1], 3)] for k, v in calib.items()},
          flush=True)
    print("per-channel absmax spread (min/median/max):",
          {k: [round(float(np.min(v)), 2), round(float(np.median(v)), 2),
               round(float(np.max(v)), 2)] for k, v in chan.items()},
          flush=True)

    results = {"scene": SCENE, "eval_h": H, "exact_vs_gt_db": p_exact,
               "calib": calib,
               "chan_spread": {k: [float(np.min(v)), float(np.median(v)),
                                   float(np.max(v))]
                               for k, v in chan.items()},
               "schemes": {}}
    for scheme in ["wonly", "static", "p999", "chan", "dyn"]:
        if scheme == "chan":
            scales = {k: jnp.maximum(jnp.asarray(v), 1e-9) for k, v in
                      chan.items()}
        else:
            scales = {k: jnp.float32(v[0] if scheme != "p999" else v[1])
                      for k, v in calib.items()}
        field = make_quant_field(params["fine"], scheme, scales)
        # dyn materializes per-point scale temporaries per layer — smaller
        # chunks keep it under HBM (the 40000-ray chunk OOM'd 16G, r4)
        frame = render_frame(field, chunk=8000 if scheme == "dyn" else 40000)
        ag, vg = psnr(frame, exact), psnr(frame, gt)
        results["schemes"][scheme] = {"agreement_db": ag, "vs_gt_db": vg}
        print(f"{scheme:7s}: agreement {ag:6.2f} dB   vs GT {vg:6.2f} dB "
              f"(exact {p_exact:.2f})", flush=True)

    out_path = os.environ.get("OUT", "docs/int8_quality.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
