"""Measure the EG3D fast-renderer speed/quality frontier on the real chip.

Mirrors tools/fast_frontier.py for the triplane stack: every row times AND
scores the SAME held-out poses of the SAME trained scene.

1. build (or reuse) the synthetic Blender sphere scene,
2. train the reference-config EG3D renderer (256^2 planes, 64+64) on-chip,
3. distill the density proxy once (shared across every operating point),
4. render 8 held-out 256^2 poses with the exact marcher and with every
   (n_candidates, n_keep) fast config (render/triplane_fast.py) —
   the 8-pose protocol (round 4, VERDICT r3 item 6): the NeRF-side round-3
   lesson was that single-pose conclusions collapse under pose diversity,
   so quality is quoted as mean AND min over poses, with per-pose arrays
   in the JSON,
5. report rays/s (median of 3 frames on pose 0, scalar-fetch synced — on
   tunneled runtimes only a host fetch synchronizes), agreement (PSNR of
   fast vs exact per pose) and PSNR vs the dataset GT for both.

Writes docs/eg3d_fast_frontier.json and prints a markdown table.

Run: python tools/eg3d_fast_frontier.py [--steps 400] [--ckpt cache.msgpack]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--distill_steps", type=int, default=500)
    ap.add_argument("--poses", type=int, default=8,
                    help="held-out 256^2 poses scored per config (timing "
                         "uses pose 0 only)")
    ap.add_argument("--scene_dir", type=str,
                    default="/tmp/eg3d_frontier_scene8")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="cache trained params here (reuse across runs)")
    ap.add_argument("--configs", type=str,
                    default="32x8,32x12,32x16,48x16,32x24,32x8m,32x16m,32x24m,32x8r,32x12r,32x16r,32x24r",
                    help="comma-separated CxK operating points; suffix "
                         "'m' = mid placement, 'r' = mid placement + "
                         "ratio quadrature")
    ap.add_argument("--out", type=str, default="docs/eg3d_fast_frontier.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tests.datasets_synthetic import make_blender_dataset
    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.datasets import dataset_dict
    from nerf_siren_tpu.render.triplane import RenderingOptions, TriPlaneConfig
    from nerf_siren_tpu.render.triplane_fast import make_fast_eg3d_renderer
    from nerf_siren_tpu.training.checkpoints import load_ckpt, save_checkpoint
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    if not os.path.exists(os.path.join(args.scene_dir, "transforms_train.json")):
        make_blender_dataset(args.scene_dir, n_train=6, n_val=args.poses,
                             hw=128)
    train_ds = dataset_dict["blender"](root_dir=args.scene_dir, split="train",
                                       img_wh=(128, 128))
    val_ds = dataset_dict["blender"](root_dir=args.scene_dir, split="val",
                                     img_wh=(256, 256))
    n_poses = min(args.poses, len(val_ds))

    cfg = TriPlaneConfig(rendering=RenderingOptions(
        depth_resolution=64, depth_resolution_importance=64,
        ray_start=2.0, ray_end=6.5, box_warp=4.0,
        white_back=train_ds.white_back))
    system = EG3DSystem(
        RenderConfig(), TrainConfig(lr=2e-3, batch_size=4096, decay_step=(8,)),
        steps_per_epoch=1000, triplane_cfg=cfg)

    state = system.init_state(jax.random.PRNGKey(0))
    if args.ckpt and os.path.exists(args.ckpt):
        params = {"eg3d_renderer": load_ckpt(
            jax.device_get(state.params)["eg3d_renderer"], args.ckpt,
            "eg3d_renderer")}
        params = jax.device_put(params)
        print("loaded cached checkpoint", flush=True)
    else:
        all_rays = np.asarray(train_ds.all_rays, np.float32)
        all_rgbs = np.asarray(train_ds.all_rgbs, np.float32)[:, :3]
        t0 = time.perf_counter()
        done, chunk = 0, 100   # scan: one dispatch per chunk, not per step
        while done < args.steps:
            nsteps = min(chunk, args.steps - done)
            state, m = system.train_scan(state, all_rays, all_rgbs,
                                         jax.random.PRNGKey(done), nsteps)
            done += nsteps
            if done % 1000 == 0 or done == args.steps:
                print(f"  step {done}: train psnr "
                      f"{float(m['train/psnr']):.2f}", flush=True)
        print(f"trained {args.steps} steps in {time.perf_counter() - t0:.1f}s, "
              f"train psnr {float(m['train/psnr']):.2f}", flush=True)
        params = state.params
        if args.ckpt:
            save_checkpoint(args.ckpt, {"params": jax.device_get(params)})

    poses = []
    for p in range(n_poses):
        sample = val_ds[p]
        poses.append({
            "rays": np.asarray(sample["rays"], np.float32),
            "gt": np.asarray(sample["rgbs"], np.float32)[:, :3]})
    n = poses[0]["rays"].shape[0]
    pose_rays = [jnp.asarray(p["rays"]) for p in poses]
    rays_j = pose_rays[0]

    def time_render(fn, reps=3):
        """Median frame time on pose 0, scalar-fetch synced."""
        for _ in range(25):  # past the tunneled runtime re-optimization
            out = fn(rays_j)
            float(jnp.sum(jnp.asarray(out["rgb_fine"]).ravel()[:4]))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(rays_j)
            float(jnp.sum(jnp.asarray(out["rgb_fine"]).ravel()[:4]))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def psnr_vs(a, b):
        return float(-10 * np.log10(max(float(np.mean((a - b) ** 2)), 1e-12)))

    def render_poses(fn):
        return [np.asarray(fn(rd)["rgb_fine"], np.float32)
                for rd in pose_rays]

    def stats(vals):
        return (float(np.mean(vals)), float(np.min(vals)),
                [round(v, 2) for v in vals])

    exact_fn = lambda rd: system.render(params, rd)
    exact_s = time_render(exact_fn)
    exact_rgbs = render_poses(exact_fn)
    gt_mean, gt_min, gt_pp = stats(
        [psnr_vs(exact_rgbs[p], poses[p]["gt"]) for p in range(n_poses)])
    rows = [{"config": "exact 64+64", "rays_per_sec": n / exact_s,
             "agreement_db": None, "psnr_vs_gt": gt_mean,
             "psnr_vs_gt_min": gt_min, "psnr_vs_gt_per_pose": gt_pp}]
    print(f"exact: {n / exact_s / 1e3:.1f}K rays/s, "
          f"{gt_mean:.2f} dB mean / {gt_min:.2f} min vs GT over "
          f"{n_poses} poses", flush=True)

    def score(fn, config, extra=None):
        """Time on pose 0, score agreement + vs-GT over all poses."""
        fast_s = time_render(fn)
        rgbs = render_poses(fn)
        ag_mean, ag_min, ag_pp = stats(
            [psnr_vs(rgbs[p], exact_rgbs[p]) for p in range(n_poses)])
        g_mean, g_min, g_pp = stats(
            [psnr_vs(rgbs[p], poses[p]["gt"]) for p in range(n_poses)])
        row = {"config": config, "rays_per_sec": n / fast_s,
               "agreement_db": ag_mean, "agreement_db_min": ag_min,
               "agreement_per_pose": ag_pp,
               "psnr_vs_gt": g_mean, "psnr_vs_gt_min": g_min,
               "psnr_vs_gt_per_pose": g_pp}
        if extra:
            row.update(extra)
        rows.append(row)
        print(f"{config}: {n / fast_s / 1e3:.1f}K rays/s, agreement "
              f"{ag_mean:.2f} dB mean / {ag_min:.2f} min, vs GT "
              f"{g_mean:.2f} mean / {g_min:.2f} min", flush=True)

    proxy = None
    for spec in args.configs.split(","):
        spec = spec.strip()
        quad = "ratio" if spec.endswith("r") else "delta"
        spec = spec.rstrip("r")
        placement = "mid" if spec.endswith("m") or quad == "ratio" else "edges"
        C, K = (int(v) for v in spec.rstrip("m").split("x"))
        fast = make_fast_eg3d_renderer(
            params["eg3d_renderer"], cfg, n_candidates=C, n_keep=K,
            distill_steps=args.distill_steps, rng=jax.random.PRNGKey(7),
            placement=placement, proxy=proxy, quadrature=quad)
        proxy = fast.proxy
        score(fast, f"C={C} K={K}"
              + (" mid" if placement == "mid" else "")
              + (" ratio" if quad == "ratio" else ""))

    # block-granularity frame-global auto-cull (r3): the per-ray variant
    # was net-negative on this 65K-ray frame (docs/status.md r2); blocks
    # cut the sort/gather overhead, and eps must account for the
    # 16x-overpredicting proxy (see tools/fast_frontier.py)
    for k, eps, placement in ((16, 0.01, "mid"), (16, 0.15, "mid"),
                              (8, 0.15, "mid"),
                              # per-frame self-calibrated eps (the default)
                              (16, "auto", "mid"), (24, "auto", "mid")):
        fast = make_fast_eg3d_renderer(
            params["eg3d_renderer"], cfg, n_candidates=32, n_keep=k,
            distill_steps=args.distill_steps, rng=jax.random.PRNGKey(7),
            cull="auto", cull_margin=1.2, opacity_eps=eps,
            prepass_candidates=16, placement=placement, proxy=proxy)
        # warm the budget through the pose SEQUENCE so every scored frame
        # runs at a realistic stale-by-one-frame budget
        for rd in pose_rays:
            fast(rd)
        act = []

        plain_flags = []

        def auto_fn(rd):
            out = fast(rd)
            act.append(fast.last_active_frac)
            plain_flags.append(bool(fast.last_plain))
            return out

        # record which PROGRAM each pose used (ADVICE r4): timing runs on
        # pose 0 after warming through the sequence, so the quoted rays/s
        # reflects pose-0's steady-state program — plain_per_pose makes it
        # explicit when a dense pose flipped into the plain bypass
        score(auto_fn, f"C=32 K={k} auto eps={eps} {placement}",
              extra={"active_frac_per_pose":
                     [round(a, 3) for a in act[-n_poses:]],
                     "plain_per_pose": plain_flags[-n_poses:],
                     "timed_pose0_plain":
                     (plain_flags[-n_poses] if plain_flags else None)})

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"frame_rays": n, "train_steps": args.steps,
                   "n_poses": n_poses, "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")

    print("\n| config | K rays/s | agreement mean/min | PSNR vs GT mean/min |")
    print("|---|---|---|---|")
    for r in rows:
        agree = (f"{r['agreement_db']:.2f}/{r['agreement_db_min']:.2f} dB"
                 if r["agreement_db"] else "—")
        print(f"| {r['config']} | {r['rays_per_sec'] / 1e3:.0f}K | {agree} "
              f"| {r['psnr_vs_gt']:.2f}/{r['psnr_vs_gt_min']:.2f} |")


if __name__ == "__main__":
    main()
