"""Measure the fast-renderer speed/quality frontier on the real TPU chip.

Addresses the round-1 gap: fast-path quality numbers were tuned on one scene
and quoted from a different experiment than the one being timed. Here every
row of the output table times AND scores the SAME 800x800 rendered frame:

1. build an analytic occlusion scene (ground truth, white back) — either the
   3-sphere scene (~60% foreground at the timing pose) or, with
   --scene cluster, a sparser 9-object layout (~30% foreground, lego-like),
2. train the full reference NeRF recipe on it (8x256 coarse+fine) on-chip,
3. distill the density proxy + estimate the scene AABB,
4. render --poses held-out 800^2 poses (default 8, spanning azimuth AND
   elevations outside the training rings) with the exact parity renderer
   and with every (select, n_candidates, n_keep) fast config,
5. report rays/s (median of 3 frames on pose 0, scalar-fetch synced) and
   agreement (PSNR of fast vs exact frame) as MEAN/MIN/per-pose across all
   poses plus PSNR vs the analytic GT — the round-2 numbers rode a single
   atypically foreground-heavy frame; worst-pose is the number to trust.

Writes docs/fast_frontier.json (or _cluster.json) and prints a markdown
table for BASELINE.md.

Run: python tools/fast_frontier.py [--steps 2500] [--scene cluster]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPHERES = [  # center, radius, color — staggered depths force occlusion
    (np.array([0.0, 0.0, 0.0]), 0.9, np.array([0.9, 0.25, 0.2])),
    (np.array([0.8, 0.55, 0.35]), 0.45, np.array([0.2, 0.7, 0.3])),
    (np.array([-0.7, -0.5, -0.4]), 0.55, np.array([0.25, 0.35, 0.9])),
]

# Sparser multi-object layout (--scene cluster): 9 small spheres spread over
# the box, ~25-35% foreground from a typical pose — the regime a real lego
# view lives in (the 3-sphere scene is ~60% foreground, atypically dense,
# which flattered the round-2 culling numbers)
_rs = np.random.RandomState(7)
CLUSTER = [
    # extent bounded so every surface stays inside the [near=2, far=6] band
    # of the radius-4 cameras (max |center|+r = 1.84 for this seed)
    (np.array(c, np.float32), float(r), np.array(col, np.float32))
    for c, r, col in zip(
        _rs.uniform(-1.2, 1.2, (9, 3)),
        _rs.uniform(0.18, 0.40, 9),
        _rs.uniform(0.15, 0.95, (9, 3)))
]
SCENES = {"spheres": SPHERES, "cluster": CLUSTER}
LIGHT = np.array([0.5, -0.3, 0.8]) / np.linalg.norm([0.5, -0.3, 0.8])


def trace_gt(rays_o: np.ndarray, rays_d: np.ndarray,
             spheres=SPHERES) -> np.ndarray:
    """Analytic render: nearest sphere hit, Lambert-shaded, white back."""
    n = rays_o.shape[0]
    best_t = np.full(n, np.inf, np.float32)
    rgb = np.ones((n, 3), np.float32)
    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    for c, r, col in spheres:
        oc = rays_o - c
        b = np.sum(oc * d, -1)
        disc = b * b - (np.sum(oc * oc, -1) - r * r)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0))
        ok = hit & (t > 0) & (t < best_t)
        normal = (rays_o[ok] + t[ok, None] * d[ok] - c) / r
        shade = 0.65 + 0.35 * np.clip(normal @ LIGHT, 0, 1)
        rgb[ok] = col * shade[:, None]
        best_t[ok] = t[ok]
    return rgb


def look_at(eye):
    eye = np.asarray(eye, np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, np.array([0.0, 0.0, 1.0], np.float32))
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    return np.stack([right, up, -fwd], 1)


def make_rays(c2w_rot, eye, h, w, focal):
    i, j = np.meshgrid(np.arange(w), np.arange(h))
    dirs = np.stack([(i - w / 2) / focal, -(j - h / 2) / focal,
                     -np.ones_like(i)], -1).astype(np.float32)
    d = dirs.reshape(-1, 3) @ c2w_rot.T
    o = np.broadcast_to(eye.astype(np.float32), d.shape).copy()
    near = np.full((d.shape[0], 1), 2.0, np.float32)
    far = np.full((d.shape[0], 1), 6.0, np.float32)
    return np.concatenate([o, d.astype(np.float32), near, far], -1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--train_hw", type=int, default=160)
    ap.add_argument("--views", type=int, default=24)
    ap.add_argument("--scene", type=str, default="spheres",
                    choices=sorted(SCENES),
                    help="analytic scene: 'spheres' (3 large, ~60% "
                         "foreground) or 'cluster' (9 small, ~30%)")
    ap.add_argument("--poses", type=int, default=8,
                    help="held-out 800^2 poses scored per config (timing "
                         "uses pose 0 only)")
    ap.add_argument("--out", type=str, default=None,
                    help="default docs/fast_frontier.json, or "
                         "docs/fast_frontier_<scene>.json for non-default "
                         "scenes")
    ap.add_argument("--scene_ckpt", type=str, default=None,
                    help="trained field+proxy cache (default "
                         "/tmp/frontier_scene_<scene>.msgpack): written "
                         "after training, reused with --reuse_scene to "
                         "iterate on the sweep without the ~30 min retrain")
    ap.add_argument("--reuse_scene", action="store_true")
    ap.add_argument("--fused_only", action="store_true",
                    help="skip the jnp-path sweep; measure only the fused "
                         "proxy-march rows (incl. adaptive-K)")
    ap.add_argument("--auto_only", action="store_true",
                    help="measure only the frame-global auto-cull rows "
                         "(implies --fused_only with an empty fused sweep)")
    ap.add_argument("--ratio_only", action="store_true",
                    help="measure only delta-vs-ratio quadrature pairs "
                         "(plain fused K sweep + auto-cull rows), merging "
                         "into an existing output JSON; use with "
                         "--reuse_scene after a full sweep")
    ap.add_argument("--edge_only", action="store_true",
                    help="measure only the silhouette-edge-refined rows "
                         "(render/fast.py::make_edge_refined_renderer over "
                         "plain-fused and auto-cull bases), merging into an "
                         "existing output JSON; use with --reuse_scene")
    ap.add_argument("--int8_only", action="store_true",
                    help="measure the int8-trunk field kernel "
                         "(ops/pallas/fused_mlp_int8.py) on a focused "
                         "fused+auto sweep, merging rows (tagged "
                         "field_dtype=int8) into the output JSON; use "
                         "with --reuse_scene")
    args = ap.parse_args()
    if args.out is None:
        args.out = ("docs/fast_frontier.json" if args.scene == "spheres"
                    else f"docs/fast_frontier_{args.scene}.json")
    if args.scene_ckpt is None:
        args.scene_ckpt = f"/tmp/frontier_scene_{args.scene}.msgpack"
        if args.scene == "spheres" and not os.path.exists(args.scene_ckpt) \
                and os.path.exists("/tmp/frontier_scene.msgpack"):
            args.scene_ckpt = "/tmp/frontier_scene.msgpack"  # legacy name
    spheres = SCENES[args.scene]

    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
    from nerf_siren_tpu.models.embedding import positional_encoding
    from nerf_siren_tpu.models.nerf import apply_nerf
    from nerf_siren_tpu.ops.pallas.fused_mlp import pack_model_params
    from nerf_siren_tpu.render.fast import (
        distill_proxy, estimate_scene_aabb, render_rays_fast)
    from nerf_siren_tpu.render.fused import render_rays_fused
    from nerf_siren_tpu.render.rendering import render_rays
    from nerf_siren_tpu.training.system import NeRFSystem

    # ---- train the scene (reference recipe shapes: 8x256, 64+64) ----------
    hw = args.train_hw
    focal = 0.5 * 800 / np.tan(0.5 * 0.6911112) * hw / 800
    views = []
    for k in range(args.views):
        phi = 2 * np.pi * k / args.views
        elev = 0.15 + 0.5 * (k % 3)       # three elevation rings
        eye = 4.0 * np.array([np.cos(phi) * np.cos(elev),
                              np.sin(phi) * np.cos(elev), np.sin(elev)])
        rot = look_at(eye)
        rays = make_rays(rot, eye, hw, hw, focal)
        views.append((rays, trace_gt(rays[:, 0:3], rays[:, 3:6], spheres)))
    all_rays = np.concatenate([v[0] for v in views])
    all_rgbs = np.concatenate([v[1] for v in views])

    nerf_cfg = NeRFConfig()  # the real 8x256 model
    from nerf_siren_tpu.training.checkpoints import (load_checkpoint,
                                                     save_checkpoint)

    if args.reuse_scene and os.path.exists(args.scene_ckpt):
        blob = load_checkpoint(args.scene_ckpt)
        params = blob["params"]
        train_psnr = float(np.asarray(blob["train_psnr"]))
        print(f"reusing {args.scene_ckpt} (train psnr {train_psnr:.2f} dB); "
              f"re-distilling proxy with current defaults", flush=True)

        def sigma_fn_reuse(pts):
            emb = positional_encoding(pts, 10)
            return apply_nerf(params["fine"], emb, None, cfg=nerf_cfg)[:, 0]

        proxy = distill_proxy(sigma_fn_reuse, [-2.2, -2.2, -2.2],
                              [2.2, 2.2, 2.2], jax.random.PRNGKey(5))
    else:
        system = NeRFSystem(
            RenderConfig(n_samples=64, n_importance=64, perturb=1.0, noise_std=1.0,
                         white_back=True),
            TrainConfig(lr=5e-4, batch_size=4096, decay_step=(100,), num_epochs=1),
            nerf_cfg, steps_per_epoch=args.steps)
        state = system.init_state(jax.random.PRNGKey(0))
        t0 = time.time()
        chunk_steps = 500  # train_scan: one device program per chunk (the
        # tunneled runtime adds ~0.15 s latency per dispatch, which would
        # otherwise triple the wall time of a 20K-step run)
        done = 0
        while done < args.steps:
            n_chunk = min(chunk_steps, args.steps - done)
            state, m = system.train_scan(state, all_rays, all_rgbs,
                                         jax.random.PRNGKey(done), n_chunk)
            done += n_chunk
            if done % 2500 == 0 or done == args.steps:
                print(f"  step {done}: train psnr {float(m['train/psnr']):.2f} dB "
                      f"({(time.time()-t0)/done*1e3:.0f} ms/step)", flush=True)
        train_psnr = float(m["train/psnr"])
        print(f"trained {args.steps} steps in {time.time()-t0:.0f}s, "
              f"train psnr {train_psnr:.2f} dB", flush=True)
        params = jax.device_get(state.params)

        def sigma_fn_train(pts):
            emb = positional_encoding(pts, 10)
            return apply_nerf(params["fine"], emb, None, cfg=nerf_cfg)[:, 0]

        proxy = jax.device_get(distill_proxy(
            sigma_fn_train, [-2.2, -2.2, -2.2], [2.2, 2.2, 2.2],
            jax.random.PRNGKey(5)))
        save_checkpoint(args.scene_ckpt,
                        {"params": params, "proxy": proxy,
                         "train_psnr": np.float32(train_psnr)})
        print(f"saved scene to {args.scene_ckpt}", flush=True)

    # ---- AABB --------------------------------------------------------------
    def sigma_fn(pts):
        emb = positional_encoding(pts, 10)
        return apply_nerf(params["fine"], emb, None, cfg=nerf_cfg)[:, 0]

    aabb = estimate_scene_aabb(sigma_fn, [-2.2] * 3, [2.2] * 3)
    print(f"aabb: {np.round(aabb[0], 2)} .. {np.round(aabb[1], 2)}", flush=True)

    # ---- held-out 800^2 poses -----------------------------------------------
    # pose 0 is the round-2 timing pose (continuity); the rest sweep azimuth
    # AND elevations outside the training rings (0.15/0.65/1.15), including
    # below-horizon views the training set never saw from
    H = W = 800
    focal800 = 0.5 * 800 / np.tan(0.5 * 0.6911112)
    pose_params = [(1.1, -0.25)]
    for p in range(1, args.poses):
        phi = 2 * np.pi * (p + 0.37) / args.poses
        elev = (-0.35, 0.4, 0.9, 0.05)[p % 4]
        pose_params.append((phi, elev))
    poses = []
    for phi, elev in pose_params:
        eye = 4.0 * np.array([np.cos(phi) * np.cos(elev),
                              np.sin(phi) * np.cos(elev), np.sin(elev)])
        rays_p = make_rays(look_at(eye), eye, H, W, focal800)
        gt_p = trace_gt(rays_p[:, 0:3], rays_p[:, 3:6], spheres)
        fg = float(np.mean(np.any(gt_p < 0.999, axis=-1)))
        poses.append({"rays": rays_p, "gt": gt_p, "fg": fg,
                      "phi": float(phi), "elev": float(elev)})
    print("pose foreground fractions: "
          + " ".join(f"{p['fg']:.2f}" for p in poses), flush=True)
    chunk = 40_000
    pose_tiles = [jnp.asarray(p["rays"].reshape(-1, chunk, 8)) for p in poses]
    tiles = pose_tiles[0]
    gt800 = poses[0]["gt"]

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    def time_frames(frame_fn, arg):
        # the tunneled runtime RE-OPTIMIZES each program over its first ~20
        # executions (verify skill; bench.py measures the same config ~20%
        # faster than a once-warmed run) — warm past that phase
        for _ in range(25):
            rgb, chk = frame_fn(arg)
        float(chk)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            rgb, chk = frame_fn(arg)
            float(chk)
            times.append(time.perf_counter() - t0)
        return np.asarray(rgb).reshape(-1, 3), float(np.median(times))

    def score_poses(frame_fn, exact_rgbs):
        """Agreement of frame_fn's render with the exact render, per pose."""
        agree, vs_gt = [], []
        for p, ptiles in enumerate(pose_tiles):
            rgb, _ = frame_fn(ptiles)
            rgb = np.asarray(rgb).reshape(-1, 3)
            agree.append(psnr(rgb, exact_rgbs[p]))
            vs_gt.append(psnr(rgb, poses[p]["gt"]))
        return agree, vs_gt

    def gt_delta_cols(vs_gt, exact_gt_per_pose):
        """THE driver-bar columns (VERDICT r4 weak #1): how much GT PSNR
        the row loses vs the exact render, mean and worst pose — the
        number the ±0.1 dB parity definition is stated on. Positive =
        the fast row renders BETTER vs GT than the exact render."""
        d = np.asarray(vs_gt) - np.asarray(exact_gt_per_pose)
        return {"psnr_vs_gt_mean": float(np.mean(vs_gt)),
                "delta_gt_vs_exact_db": float(np.mean(d)),
                "delta_gt_worst_pose_db": float(np.min(d))}

    exact_cfg = RenderConfig(n_samples=64, n_importance=64, perturb=0.0,
                             noise_std=0.0, white_back=True, test_time=True)
    packed = pack_model_params(params, nerf_cfg)
    packed_field, field_dtype = packed, "bf16"
    if args.int8_only:
        # swap the survivor-eval kernel for the int8-trunk variant; the
        # pack carries everything (render_rays_fast dispatches on it).
        # The exact anchor below stays bf16 — agreement still means
        # "vs the exact reference-algorithm render".
        from nerf_siren_tpu.ops.pallas.fused_mlp_int8 import (
            pack_model_params_int8)
        packed_field = pack_model_params_int8(params, nerf_cfg)
        field_dtype = "int8"

    @jax.jit
    def exact_frame(tiles):
        def f(t):
            return render_rays_fused(packed, t, exact_cfg,
                                     nerf_cfg=nerf_cfg)["rgb_fine"]
        rgb = jax.lax.map(f, tiles)
        return rgb, jnp.sum(rgb)

    @jax.jit
    def exact_frame_jnp(tiles):
        def f(t):
            return render_rays(params, t, exact_cfg, None, nerf_cfg=nerf_cfg,
                               compute_dtype=jnp.bfloat16)["rgb_fine"]
        rgb = jax.lax.map(f, tiles)
        return rgb, jnp.sum(rgb)

    exact_rgb, exact_t = time_frames(exact_frame, tiles)
    exact_rate = H * W / exact_t
    exact_rgbs = [exact_rgb]
    for ptiles in pose_tiles[1:]:
        r_p, _ = exact_frame(ptiles)
        exact_rgbs.append(np.asarray(r_p).reshape(-1, 3))
    exact_gt_per_pose = [psnr(exact_rgbs[p], poses[p]["gt"])
                         for p in range(len(poses))]
    jnp_rgb, jnp_t = time_frames(exact_frame_jnp, tiles)
    print(f"exact (fused): {exact_rate/1e6:.3f} M rays/s, "
          f"{psnr(exact_rgb, gt800):.2f} dB vs GT on pose 0 "
          f"(per-pose {['%.2f' % v for v in exact_gt_per_pose]}), "
          f"{psnr(exact_rgb, jnp_rgb):.2f} dB vs jnp exact "
          f"({H*W/jnp_t/1e6:.3f} M rays/s)", flush=True)

    results = {"train_psnr": train_psnr,
               "scene": args.scene,
               "poses": [{"phi": p["phi"], "elev": p["elev"],
                          "foreground_frac": p["fg"]} for p in poses],
               "exact": {"rays_per_sec": exact_rate,
                         "psnr_vs_gt": psnr(exact_rgb, gt800),
                         "psnr_vs_gt_per_pose": exact_gt_per_pose,
                         "jnp_rays_per_sec": H * W / jnp_t,
                         "fused_vs_jnp_db": psnr(exact_rgb, jnp_rgb)},
               "configs": []}

    sweep = [("topk", c, k)
             for (c, k) in ((32, 8), (32, 16), (48, 8), (48, 12), (64, 8),
                            (64, 12), (64, 16), (64, 32), (96, 12), (96, 16),
                            (128, 16), (128, 32))]
    sweep += [("pdf", 32, 16), ("pdf", 64, 16)]  # record: pdf loses to topk
    if (args.fused_only or args.auto_only or args.ratio_only
            or args.int8_only or args.edge_only):
        sweep = []
    for sel, c, k in sweep:
        @jax.jit
        def fast_frame(tiles, sel=sel, c=c, k=k):
            def f(t):
                return render_rays_fast(
                    params, proxy, t, n_candidates=c, n_keep=k,
                    nerf_cfg=nerf_cfg, white_back=True, scene_aabb=aabb,
                    select=sel, packed_params=packed_field)["rgb_fine"]
            rgb = jax.lax.map(f, tiles)
            return rgb, jnp.sum(rgb)

        rgb, t = time_frames(fast_frame, tiles)
        rate = H * W / t
        agree, vs_gt = score_poses(fast_frame, exact_rgbs)
        row = {"select": sel, "n_candidates": c, "n_keep": k,
               "rays_per_sec": rate,
               "agreement_db_vs_exact": float(np.mean(agree)),
               "agreement_min_db": float(np.min(agree)),
               "agreement_per_pose": agree,
               "psnr_vs_gt": vs_gt[0],
               "psnr_vs_gt_per_pose": vs_gt,
               **gt_delta_cols(vs_gt, exact_gt_per_pose)}
        results["configs"].append(row)
        print(f"{sel:5s} C={c:3d} K={k:3d}: {rate/1e6:6.2f} M rays/s  "
              f"agree mean {row['agreement_db_vs_exact']:6.2f} / "
              f"min {row['agreement_min_db']:6.2f} dB  "
              f"gt {row['psnr_vs_gt']:6.2f} dB", flush=True)

    # ---- fused proxy-march sweep (ops/pallas/proxy_march.py), incl. the
    # per-ray adaptive-K rows: every ray at K=n_keep, the `frac` most
    # ambiguous re-rendered at k_hi (avg model evals/ray = K + frac*k_hi)
    from nerf_siren_tpu.ops.pallas.proxy_march import pack_proxy_params
    packed_proxy = pack_proxy_params(proxy)
    fused_sweep = [
        # (C, K, adaptive, cull, placement, quadrature)
        (32, 8, None, None, "edges", "delta"),
        (32, 16, None, None, "edges", "delta"),
        (32, 8, (0.0625, 32), None, "edges", "delta"),   # avg 10
        (32, 8, (0.125, 32), None, "edges", "delta"),    # avg 12
        (32, 8, (0.125, 48), None, "edges", "delta"),    # avg 14
        (32, 8, (0.25, 32), None, "edges", "delta"),     # avg 16
        (32, 8, (0.25, 48), None, "edges", "delta"),     # avg 20
        (32, 16, (0.125, 48), None, "edges", "delta"),   # avg 22
        (32, 16, (0.25, 64), None, "edges", "delta"),    # avg 32
        # empty-ray culling: K only on the `cull` most proxy-opaque rays
        (32, 16, None, 0.35, "edges", "delta"),          # avg 5.6
        (32, 16, None, 0.45, "edges", "delta"),          # avg 7.2
        (32, 16, None, 0.55, "edges", "delta"),          # avg 8.8
        (32, 16, None, 0.65, "edges", "delta"),          # avg 10.4
        (32, 24, None, 0.45, "edges", "delta"),          # avg 10.8
        (32, 32, None, 0.45, "edges", "delta"),          # avg 14.4
        # strata-centered quantiles: same cost, better small-K quadrature
        (32, 8, None, None, "mid", "delta"),
        (32, 16, None, None, "mid", "delta"),
        (32, 24, None, None, "mid", "delta"),
        (32, 32, None, None, "mid", "delta"),
        # proxy-shaped stratum (ratio) quadrature: same cost as mid-delta
        (32, 8, None, None, "mid", "ratio"),
        (32, 12, None, None, "mid", "ratio"),
        (32, 16, None, None, "mid", "ratio"),
        (32, 24, None, None, "mid", "ratio"),
    ]
    if args.ratio_only:
        fused_sweep = [
            (32, 8, None, None, "mid", "delta"),
            (32, 12, None, None, "mid", "delta"),
            (32, 16, None, None, "mid", "delta"),
            (32, 24, None, None, "mid", "delta"),
            (32, 8, None, None, "mid", "ratio"),
            (32, 12, None, None, "mid", "ratio"),
            (32, 16, None, None, "mid", "ratio"),
            (32, 24, None, None, "mid", "ratio"),
            # ratio + FINER CDF: at C=32 both rules are bounded by the
            # same within-cell uniformity (measured wash); extra
            # candidates refine ratio's integration, not just placement
            # (the round-2 "C does not help" negative was delta-only)
            (64, 12, None, None, "mid", "ratio"),
            (64, 16, None, None, "mid", "ratio"),
            (96, 16, None, None, "mid", "ratio"),
        ]
    if args.int8_only:
        # bf16 twins of every row exist in the merged JSON already; the
        # question here is purely "what does the int8 trunk change"
        fused_sweep = [
            (32, 8, None, None, "mid", "delta"),
            (32, 12, None, None, "mid", "ratio"),
            (32, 16, None, None, "mid", "delta"),
            (32, 16, None, None, "mid", "ratio"),
            (32, 24, None, None, "mid", "ratio"),
            (64, 16, None, None, "mid", "ratio"),
        ]
    if args.auto_only or args.edge_only:
        fused_sweep = []
    results["fused_adaptive_configs"] = []
    for c, k, adapt, cull, placement, quad in fused_sweep:
        @jax.jit
        def fused_frame(tiles, c=c, k=k, adapt=adapt, cull=cull,
                        placement=placement, quad=quad):
            def f(t):
                return render_rays_fast(
                    params, proxy, t, n_candidates=c, n_keep=k,
                    nerf_cfg=nerf_cfg, white_back=True, scene_aabb=aabb,
                    select="pdf", packed_params=packed_field,
                    packed_proxy=packed_proxy, adaptive=adapt,
                    cull=cull, placement=placement,
                    quadrature=quad)["rgb_fine"]
            rgb = jax.lax.map(f, tiles)
            return rgb, jnp.sum(rgb)

        rgb, t = time_frames(fused_frame, tiles)
        rate = H * W / t
        agree, vs_gt = score_poses(fused_frame, exact_rgbs)
        avg_k = k + (adapt[0] * adapt[1] if adapt else 0)
        if cull is not None:
            avg_k = cull * k
        row = {"select": "pdf+fused-march", "n_candidates": c, "n_keep": k,
               "adaptive": list(adapt) if adapt else None,
               "cull": cull, "avg_k": avg_k, "placement": placement,
               "quadrature": quad, "field_dtype": field_dtype,
               "rays_per_sec": rate,
               "agreement_db_vs_exact": float(np.mean(agree)),
               "agreement_min_db": float(np.min(agree)),
               "agreement_per_pose": agree,
               "psnr_vs_gt": vs_gt[0],
               "psnr_vs_gt_per_pose": vs_gt,
               **gt_delta_cols(vs_gt, exact_gt_per_pose)}
        results["fused_adaptive_configs"].append(row)
        ad = (f"+{adapt[0]:.3f}x{adapt[1]}" if adapt
              else f" cull={cull}" if cull is not None
              else " mid" if placement == "mid" else "")
        if quad == "ratio":
            ad += " ratio"
        if field_dtype == "int8":
            ad += " i8"
        print(f"fused C={c:3d} K={k:3d}{ad:12s} (avg {avg_k:5.1f}): "
              f"{rate/1e6:6.2f} M rays/s  "
              f"agree mean {row['agreement_db_vs_exact']:6.2f} / "
              f"min {row['agreement_min_db']:6.2f} dB  "
              f"gt {row['psnr_vs_gt']:6.2f} dB", flush=True)

    # ---- frame-global auto culling (render/fast.py::make_auto_cull_renderer)
    # budget sized per frame from the opacity prepass — the safe cull mode
    from nerf_siren_tpu.render.fast import make_auto_cull_renderer
    results["auto_cull_configs"] = []
    pose_rays_dev = [jnp.asarray(p["rays"]) for p in poses]
    # Measured r3: opacity_eps=0.01 counts ~every ray as foreground on the
    # overpredicting (16x) proxy, so the budget stays ~full and auto-cull
    # pays prepass+sort for nothing (3.76M vs plain 4.71M at K=16). The eps
    # sweep below calibrates: proxy opacity eps corresponds to a much
    # smaller TRUE opacity. prepass_c=16 halves the prepass; placement=mid
    # is the strata-centered quantile (better small-K quadrature).
    auto_sweep = [
        (16, 1.1, None, "edges", 0.01, "delta"),  # round-2 continuity row
        (8, 1.3, None, "edges", 0.01, "delta"),
        (16, 1.2, 16, "mid", 0.05, "delta"),
        (16, 1.2, 16, "mid", 0.15, "delta"),
        (16, 1.2, 16, "mid", 0.30, "delta"),
        (24, 1.2, 16, "mid", 0.15, "delta"),
        (32, 1.2, 16, "mid", 0.15, "delta"),
        # per-frame self-calibrated threshold (the shipped default —
        # no scene-specific hand tuning)
        (16, 1.2, 16, "mid", "auto", "delta"),
        (24, 1.2, 16, "mid", "auto", "delta"),
        (32, 1.2, 16, "mid", "auto", "delta"),
        # cheaper prepass: ranking needs even less resolution than 16
        (16, 1.2, 8, "mid", "auto", "delta"),
        (24, 1.2, 8, "mid", "auto", "delta"),
        # proxy-shaped stratum quadrature under the safe auto-cull driver
        (12, 1.2, 16, "mid", "auto", "ratio"),
        (16, 1.2, 16, "mid", "auto", "ratio"),
        (24, 1.2, 16, "mid", "auto", "ratio"),
    ]
    if args.ratio_only:
        auto_sweep = [r for r in auto_sweep if r[5] == "ratio"]
    if args.edge_only:
        auto_sweep = []
    if args.int8_only:
        auto_sweep = [
            (12, 1.2, 8, "mid", "auto", "ratio"),
            (16, 1.2, 8, "mid", "auto", "ratio"),
            (16, 1.2, 16, "mid", "auto", "delta"),
            (24, 1.2, 8, "mid", "auto", "ratio"),
        ]
    for k, margin, prepass_c, placement, eps, quad in auto_sweep:
        auto_render = make_auto_cull_renderer(
            params, proxy, n_candidates=32, n_keep=k, nerf_cfg=nerf_cfg,
            white_back=True, scene_aabb=aabb, packed_params=packed_field,
            packed_proxy=packed_proxy, margin=margin,
            prepass_candidates=prepass_c, placement=placement,
            opacity_eps=eps, quadrature=quad)

        def auto_frame(rays_dev):
            out = auto_render(rays_dev)["rgb_fine"]
            return out, jnp.sum(out)

        # warm the budget through the pose SEQUENCE (the renderer's intended
        # drive: each frame's budget comes from the previous frame), then
        # time pose 0 and score a second pass — every scored frame runs at a
        # realistic stale-by-one-frame budget, including the pose-to-pose
        # foreground swings this pose set was built to stress
        for rd in pose_rays_dev:
            float(auto_frame(rd)[1])
        rgb, t = time_frames(auto_frame, pose_rays_dev[0])
        rate = H * W / t
        agree, vs_gt, act, eps_used = [], [], [], []
        for p, rd in enumerate(pose_rays_dev):
            r_p = np.asarray(auto_frame(rd)[0]).reshape(-1, 3)
            act.append(auto_render.last_active_frac)
            eps_used.append(float(np.asarray(auto_render.last_eps)))
            agree.append(psnr(r_p, exact_rgbs[p]))
            vs_gt.append(psnr(r_p, poses[p]["gt"]))
        row = {"select": "pdf+fused-march+auto-cull", "n_candidates": 32,
               "n_keep": k, "margin": margin, "prepass_candidates": prepass_c,
               "placement": placement, "opacity_eps": eps,
               "quadrature": quad, "field_dtype": field_dtype,
               "eps_per_pose": eps_used,
               "active_frac_per_pose": act,
               "rays_per_sec": rate,
               "agreement_db_vs_exact": float(np.mean(agree)),
               "agreement_min_db": float(np.min(agree)),
               "agreement_per_pose": agree,
               "psnr_vs_gt": vs_gt[0],
               "psnr_vs_gt_per_pose": vs_gt,
               **gt_delta_cols(vs_gt, exact_gt_per_pose)}
        results["auto_cull_configs"].append(row)
        print(f"auto  C= 32 K={k:3d} margin={margin:.2f} "
              f"pp={prepass_c or 32:2d} {placement[:4]} eps={eps} "
              f"{'ratio ' if quad == 'ratio' else ''}"
              f"act={np.mean(act):.2f}: "
              f"{rate/1e6:6.2f} M rays/s  "
              f"agree mean {row['agreement_db_vs_exact']:6.2f} / "
              f"min {row['agreement_min_db']:6.2f} dB  "
              f"gt {row['psnr_vs_gt']:6.2f} dB", flush=True)

    # ---- silhouette-edge-refined rows (render/fast.py, round 5) ------------
    # The configs that close VERDICT r4 item 1: base fast render + exact-lite
    # re-render of the top cap_frac edge-scored rays. Scored like every other
    # row (8 poses, mean/min agreement, GT per pose) plus the driver-bar
    # delta columns.
    from nerf_siren_tpu.render.fast import make_edge_refined_renderer
    results["edge_refined_configs"] = []
    edge_sweep = []
    if args.edge_only:
        # (base, K, cap_frac, lite_ns, lite_ni, eps, int8)
        # sweep #2 (worst-pose push): cap didn't move worst-pose
        # (0.02 -> 0.03 measured -0.215 -> -0.225), base K did
        # (K8 -0.367 -> K16 -0.215) — so probe richer lite passes and a
        # K=24 base rather than wider bands
        # sweep #3: lite 64+24 fixed the worst pose (-0.104 vs -0.215 at
        # 48+16 — the residual was the lite pass's importance count, not
        # the edge cap or base K); int8 twins + a cap-margin probe + K12
        edge_sweep = [
            ("auto", 16, 0.02, 64, 24, "auto", True),
            ("auto", 16, 0.03, 64, 24, "auto", False),
            ("auto", 12, 0.02, 64, 24, "auto", True),
            ("auto", 12, 0.02, 64, 24, "auto", False),
            ("auto", 16, 0.02, 64, 32, "auto", False),
        ]
    pose_rays_dev_e = [jnp.asarray(p["rays"]) for p in poses]
    packed_i8 = None
    for base_kind, k, cap, ns, ni, eps, use_i8 in edge_sweep:
        if use_i8 and packed_i8 is None:
            from nerf_siren_tpu.ops.pallas.fused_mlp_int8 import (
                pack_model_params_int8)
            packed_i8 = pack_model_params_int8(params, nerf_cfg)
        fld = packed_i8 if use_i8 else packed
        if base_kind == "auto":
            base = make_auto_cull_renderer(
                params, proxy, n_candidates=32, n_keep=k, nerf_cfg=nerf_cfg,
                white_back=True, scene_aabb=aabb, packed_params=fld,
                packed_proxy=packed_proxy, margin=1.2, prepass_candidates=16,
                placement="mid", opacity_eps=eps, quadrature="delta")
        else:
            @jax.jit
            def base_jit(rays, k=k, fld=fld):
                tiles = rays.reshape(-1, chunk, 8)
                out = jax.lax.map(
                    lambda t: render_rays_fast(
                        params, proxy, t, n_candidates=32, n_keep=k,
                        nerf_cfg=nerf_cfg, white_back=True, scene_aabb=aabb,
                        select="pdf", packed_params=fld,
                        packed_proxy=packed_proxy, placement="mid"), tiles)
                return {kk: v.reshape(H * W, *v.shape[2:])
                        for kk, v in out.items()}
            base = base_jit
        # the lite pass keeps the bf16 pack even for int8 bases: it is the
        # quality anchor on exactly the pixels that need precision
        er = make_edge_refined_renderer(
            base, packed, (H, W), nerf_cfg=nerf_cfg, white_back=True,
            n_samples=ns, n_importance=ni, cap_frac=cap)

        def er_frame(rays_dev, er=er):
            out = er(rays_dev)["rgb_fine"]
            return out, jnp.sum(out)

        for rd in pose_rays_dev_e:   # warm budgets through the sequence
            float(er_frame(rd)[1])
        rgb, t = time_frames(er_frame, pose_rays_dev_e[0])
        rate = H * W / t
        agree, vs_gt = [], []
        for p, rd in enumerate(pose_rays_dev_e):
            r_p = np.asarray(er_frame(rd)[0]).reshape(-1, 3)
            agree.append(psnr(r_p, exact_rgbs[p]))
            vs_gt.append(psnr(r_p, poses[p]["gt"]))
        row = {"select": f"edge-refined+{base_kind}", "n_candidates": 32,
               "n_keep": k, "cap_frac": cap, "lite": [ns, ni],
               "placement": "mid", "quadrature": "delta",
               "opacity_eps": eps,
               "field_dtype": "int8" if use_i8 else "bf16",
               "rays_per_sec": rate,
               "agreement_db_vs_exact": float(np.mean(agree)),
               "agreement_min_db": float(np.min(agree)),
               "agreement_per_pose": agree,
               "psnr_vs_gt": vs_gt[0],
               "psnr_vs_gt_per_pose": vs_gt,
               **gt_delta_cols(vs_gt, exact_gt_per_pose)}
        results["edge_refined_configs"].append(row)
        print(f"edge  {base_kind:5s} K={k:3d} cap={cap:.2f} "
              f"lite={ns}+{ni}{' i8' if use_i8 else '   '}: "
              f"{rate/1e6:6.2f} M rays/s  dGT {row['delta_gt_vs_exact_db']:+.3f}"
              f" (worst {row['delta_gt_worst_pose_db']:+.3f})  "
              f"agree {row['agreement_db_vs_exact']:6.2f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if (args.ratio_only or args.int8_only or args.fused_only
            or args.auto_only or args.edge_only) and os.path.exists(args.out):
        # append/refresh the measured rows inside the existing sweeps.
        # ROW-wise merge for every partial mode: a wholesale list replace
        # (the old fused_only/auto_only path) silently destroyed rows a
        # previous partial run had merged (r4: an auto_only re-measure
        # wiped the int8 auto rows). prepass_candidates is part of the
        # key — pp=8 and pp=16 twins are distinct operating points.
        with open(args.out) as f:
            merged = json.load(f)

        def _key(row):
            return tuple(str(row.get(f)) for f in (
                "select", "n_candidates", "n_keep", "adaptive", "cull",
                "placement", "quadrature", "margin", "opacity_eps",
                "prepass_candidates", "cap_frac", "lite")
            ) + (str(row.get("field_dtype") or "bf16"),)

        for field in ("configs", "fused_adaptive_configs",
                      "auto_cull_configs", "edge_refined_configs"):
            fresh = {_key(r): r for r in results.get(field, [])}
            kept = [r for r in merged.get(field, [])
                    if _key(r) not in fresh]
            merged[field] = kept + list(fresh.values())
        # non-sweep fields (train_psnr, exact, poses): fresh wins
        merged.update({k: v for k, v in results.items()
                       if not isinstance(v, list)
                       and k not in ("configs", "fused_adaptive_configs",
                                     "auto_cull_configs")})
        merged["poses"] = results.get("poses") or merged.get("poses")
        results = merged
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)

    print("\n| select | C | K | M rays/s | agree mean/min dB | PSNR vs GT |")
    print("|---|---|---|---|---|---|")
    print(f"| exact | 64 | +64 | {exact_rate/1e6:.2f} | — | "
          f"{results['exact']['psnr_vs_gt']:.2f} |")
    for r in results["configs"]:
        print(f"| {r['select']} | {r['n_candidates']} | {r['n_keep']} | "
              f"{r['rays_per_sec']/1e6:.2f} | {r['agreement_db_vs_exact']:.2f}"
              f"/{r.get('agreement_min_db', float('nan')):.2f} | "
              f"{r['psnr_vs_gt']:.2f} |")


if __name__ == "__main__":
    main()
