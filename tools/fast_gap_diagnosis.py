"""Decompose the fast path's ~0.4-0.5 dB GT deficit vs the exact render.

Round-4 judge finding (VERDICT.md item 1): every fast-frontier row on the
cluster scene renders 0.38-0.55 dB BELOW the exact render vs analytic GT,
and the deficit saturates with K (K=16 -0.52, K=32 -0.39) while agreement
keeps climbing — i.e. the residual is a systematic component shared across
operating points, not diffuse quadrature noise. This tool isolates its
mechanism by rendering the same held-out 800^2 poses under controlled
variants of the pipeline, all quality-only (jnp math, no Pallas — the r4
JSON shows jnp and fused rows with identical dGT, so the jnp path is a
faithful quality stand-in for the kernel path):

  exact@J      exact algorithm (64 coarse + J importance): how much does
               the REFERENCE algorithm itself lose at reduced fine counts?
               This anchors what K samples can possibly achieve.
  fieldcdf     candidates scored by the TRUE field sigma instead of the
               proxy: isolates proxy-CDF placement error.
  ufrac=f      blend fraction f of uniform mass into the proxy CDF before
               inverse-CDF selection: tests the "proxy misses faint
               density the exact path's 64 uniform coarse samples catch"
               hypothesis at zero extra cost.
  +uJ          merge J extra uniform samples into the K survivors (cost
               K+J): the exact path's coarse-contribution analogue.
  C=c,K=k      candidate-resolution scaling at high K.

Writes docs/fast_gap_diagnosis.json. Reuses the frontier scene checkpoint
(/tmp/frontier_scene_<scene>.msgpack) — run tools/fast_frontier.py first if
it does not exist.

Run: python tools/fast_gap_diagnosis.py [--scene cluster] [--poses 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fast_frontier import SCENES, look_at, make_rays, trace_gt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", type=str, default="cluster")
    ap.add_argument("--poses", type=int, default=4)
    ap.add_argument("--hw", type=int, default=800)
    ap.add_argument("--out", type=str, default="docs/fast_gap_diagnosis.json")
    ap.add_argument("--phase2_only", action="store_true")
    ap.add_argument("--phase4_only", action="store_true",
                    help="exact 64+64 anchor + edge-refined variants only")
    args = ap.parse_args()
    if args.phase4_only:
        args.phase2_only = True

    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig
    from nerf_siren_tpu.models.embedding import positional_encoding
    from nerf_siren_tpu.models.nerf import apply_nerf
    from nerf_siren_tpu.ops.sample_pdf import sample_pdf
    from nerf_siren_tpu.render.fast import (apply_proxy, estimate_scene_aabb)
    from nerf_siren_tpu.render.rendering import render_rays
    from nerf_siren_tpu.training.checkpoints import load_checkpoint

    spheres = SCENES[args.scene]
    ckpt = f"/tmp/frontier_scene_{args.scene}.msgpack"
    blob = load_checkpoint(ckpt)
    params, proxy = blob["params"], blob["proxy"]
    print(f"loaded {ckpt} (train psnr {float(np.asarray(blob['train_psnr'])):.2f})",
          flush=True)
    nerf_cfg = NeRFConfig()

    def sigma_fn(pts):
        emb = positional_encoding(pts, 10)
        return apply_nerf(params["fine"], emb, None, cfg=nerf_cfg)[:, 0]

    aabb = estimate_scene_aabb(sigma_fn, [-2.2] * 3, [2.2] * 3)

    # ---- poses: same construction as tools/fast_frontier.py ---------------
    H = W = args.hw
    focal = 0.5 * args.hw / np.tan(0.5 * 0.6911112)
    pose_params = [(1.1, -0.25)]
    for p in range(1, args.poses):
        phi = 2 * np.pi * (p + 0.37) / 8          # keep the 8-pose angles
        elev = (-0.35, 0.4, 0.9, 0.05)[p % 4]
        pose_params.append((phi, elev))
    poses = []
    for phi, elev in pose_params:
        eye = 4.0 * np.array([np.cos(phi) * np.cos(elev),
                              np.sin(phi) * np.cos(elev), np.sin(elev)])
        rays_p = make_rays(look_at(eye), eye, H, W, focal)
        gt_p = trace_gt(rays_p[:, 0:3], rays_p[:, 3:6], spheres)
        poses.append({"rays": rays_p, "gt": gt_p})
    chunk = 40_000
    pose_tiles = [jnp.asarray(p["rays"].reshape(-1, chunk, 8)) for p in poses]

    def psnr(a, b):
        return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    results = {"scene": args.scene, "poses": args.poses, "hw": args.hw,
               "rows": []}

    def run_variant(label, frame_fn, exact_rgbs=None):
        vs_gt, agree = [], []
        for p, ptiles in enumerate(pose_tiles):
            rgb = np.asarray(frame_fn(ptiles)).reshape(-1, 3)
            vs_gt.append(psnr(rgb, poses[p]["gt"]))
            if exact_rgbs is not None:
                agree.append(psnr(rgb, exact_rgbs[p]))
        row = {"label": label, "psnr_vs_gt_mean": float(np.mean(vs_gt)),
               "psnr_vs_gt_per_pose": vs_gt}
        if exact_rgbs is not None:
            row["agreement_db"] = float(np.mean(agree))
            exact_mean = results["rows"][0]["psnr_vs_gt_mean"]
            row["delta_gt_vs_exact_db"] = row["psnr_vs_gt_mean"] - exact_mean
            dworst = min(g - e for g, e in zip(
                vs_gt, results["rows"][0]["psnr_vs_gt_per_pose"]))
            row["delta_gt_worst_pose_db"] = float(dworst)
        results["rows"].append(row)
        extra = ""
        if exact_rgbs is not None:
            extra = (f"  dGT {row['delta_gt_vs_exact_db']:+.3f} "
                     f"(worst {row['delta_gt_worst_pose_db']:+.3f})  "
                     f"agree {row['agreement_db']:.2f}")
        print(f"{label:34s} GT {row['psnr_vs_gt_mean']:.3f}{extra}", flush=True)
        return row

    # ---- exact anchors at several importance counts ------------------------
    def exact_frame(n_imp):
        cfg = RenderConfig(n_samples=64, n_importance=n_imp, perturb=0.0,
                           noise_std=0.0, white_back=True, test_time=True)

        @jax.jit
        def f(tiles):
            def g(t):
                out = render_rays(params, t, cfg, None, nerf_cfg=nerf_cfg,
                                  compute_dtype=jnp.bfloat16)
                return out["rgb_fine" if n_imp > 0 else "rgb_coarse"]
            return jax.lax.map(g, tiles)
        return f

    run_variant("exact 64+64", exact_frame(64))
    exact_rgbs = [np.asarray(exact_frame(64)(pt)).reshape(-1, 3)
                  for pt in pose_tiles]
    if not args.phase4_only:
        for j in (32, 16, 8):
            run_variant(f"exact 64+{j}", exact_frame(j), exact_rgbs)

    # ---- controlled fast variants (jnp pdf path re-implemented with knobs) -
    def fast_frame(C=32, K=16, score="proxy", ufrac=0.0, extra_u=0,
                   final_delta="spacing", fdtype=jnp.bfloat16,
                   quad="delta", subdiv=0):
        @jax.jit
        def f(tiles):
            def g(rays):
                rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
                near, far = rays[:, 6:7], rays[:, 7:8]
                dirn = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
                r = rays.shape[0]
                # AABB tighten (same as render_rays_fast)
                lo = jnp.asarray(aabb[0], jnp.float32)
                hi = jnp.asarray(aabb[1], jnp.float32)
                invd = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
                t_lo, t_hi = (lo - rays_o) * invd, (hi - rays_o) * invd
                t_min = jnp.max(jnp.minimum(t_lo, t_hi), -1, keepdims=True)
                t_max = jnp.min(jnp.maximum(t_lo, t_hi), -1, keepdims=True)
                hits = t_max > jnp.maximum(t_min, 0.0)
                near_c = jnp.where(hits, jnp.clip(t_min, near, far), near)
                far_c = jnp.where(hits, jnp.clip(t_max, near, far), far)
                t = jnp.linspace(0.0, 1.0, C)
                z = near_c * (1 - t) + far_c * t
                spacing = (far_c - near_c) / (C - 1)
                xyz = rays_o[:, None] + rays_d[:, None] * z[..., None]
                if score == "proxy":
                    sc = apply_proxy(proxy, xyz, jnp.bfloat16)
                    sig_hat = jnp.expm1(jax.nn.relu(sc.astype(jnp.float32)))
                else:  # 'field': true sigma at the candidates
                    emb = positional_encoding(xyz, 10)
                    sig_hat = jax.nn.relu(apply_nerf(
                        params["fine"], emb.reshape(r * C, -1), None,
                        cfg=nerf_cfg,
                        compute_dtype=fdtype)[:, 0].reshape(r, C))
                a_hat = 1.0 - jnp.exp(-sig_hat * spacing * dirn)
                tr = jnp.cumprod(1.0 - a_hat + 1e-10, axis=-1)
                tr = jnp.concatenate(
                    [jnp.ones_like(tr[:, :1]), tr[:, :-1]], -1)
                w_hat = a_hat * tr
                if ufrac > 0:
                    wi = w_hat[:, 1:-1]
                    tot = jnp.sum(wi, -1, keepdims=True)
                    w_hat = w_hat.at[:, 1:-1].set(
                        wi * (1 - ufrac)
                        + ufrac * (tot + 1e-3) / wi.shape[-1])
                z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
                z_sel = sample_pdf(z_mid, w_hat[:, 1:-1], K, rng=None,
                                   det=True, midpoint=True)
                if extra_u > 0:
                    tu = (jnp.arange(extra_u) + 0.5) / extra_u
                    z_u = near_c * (1 - tu) + far_c * tu
                    z_sel = jnp.concatenate([z_sel, z_u], -1)
                z_sel = jnp.sort(z_sel, axis=-1)
                emb = positional_encoding(
                    rays_o[:, None] + rays_d[:, None] * z_sel[..., None], 10)
                demb = positional_encoding(rays_d, 4)
                demb = jnp.broadcast_to(demb[:, None],
                                        (r, z_sel.shape[-1], demb.shape[-1]))
                raw = apply_nerf(params["fine"], emb, demb, cfg=nerf_cfg,
                                 compute_dtype=fdtype)
                sig = jax.nn.relu(raw[..., 3])
                if final_delta == "inf":
                    last = jnp.full_like(spacing, 1e10)
                else:
                    last = jnp.broadcast_to(spacing, (r, 1))
                deltas = jnp.concatenate(
                    [z_sel[:, 1:] - z_sel[:, :-1], last], -1) * dirn
                if subdiv > 0:
                    # PERFECT-QUADRATURE upper bound: true field sigma at
                    # `subdiv` sub-points per kept interval; each interval's
                    # optical depth integrates the fine sigmas (rectangle
                    # at subdiv resolution), rgb stays at the K samples.
                    Kk = z_sel.shape[-1]
                    z_next = jnp.concatenate(
                        [z_sel[:, 1:], z_sel[:, -1:] + spacing], -1)
                    frac = (jnp.arange(subdiv) + 0.5) / subdiv
                    z_fine = (z_sel[..., None]
                              + (z_next - z_sel)[..., None] * frac)
                    embf = positional_encoding(
                        rays_o[:, None] + rays_d[:, None]
                        * z_fine.reshape(r, Kk * subdiv)[..., None], 10)
                    sigf = jax.nn.relu(apply_nerf(
                        params["fine"], embf.reshape(r * Kk * subdiv, -1),
                        None, cfg=nerf_cfg, compute_dtype=fdtype)[:, 0]
                        .reshape(r, Kk, subdiv))
                    tau = (jnp.mean(sigf, -1) * deltas)
                    alphas = 1.0 - jnp.exp(-tau)
                elif quad == "trapezoid":
                    sig_next = jnp.concatenate(
                        [sig[:, 1:], sig[:, -1:]], -1)
                    alphas = 1.0 - jnp.exp(
                        -deltas * 0.5 * (sig + sig_next))
                else:
                    alphas = 1.0 - jnp.exp(-deltas * sig)
                trans = jnp.cumprod(1.0 - alphas + 1e-10, -1)
                trans = jnp.concatenate(
                    [jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
                wts = alphas * trans
                rgb = jnp.sum(wts[..., None] * raw[..., :3], -2)
                return rgb + (1.0 - jnp.sum(wts, -1, keepdims=True))
            return jax.lax.map(g, tiles)
        return f

    if not args.phase2_only:
        run_variant("fast C32 K16 (baseline)", fast_frame(), exact_rgbs)
        run_variant("fast C32 K32", fast_frame(K=32), exact_rgbs)
        run_variant("fast C32 K16 field-cdf", fast_frame(score="field"),
                    exact_rgbs)
        run_variant("fast C32 K32 field-cdf", fast_frame(K=32, score="field"),
                    exact_rgbs)
        run_variant("fast C32 K16 f32-eval",
                    fast_frame(fdtype=jnp.float32), exact_rgbs)
        run_variant("fast C32 K16 final-inf",
                    fast_frame(final_delta="inf"), exact_rgbs)
        for f_u in (0.05, 0.15, 0.30):
            run_variant(f"fast C32 K16 ufrac={f_u}", fast_frame(ufrac=f_u),
                        exact_rgbs)
        run_variant("fast C32 K16+u8 (cost 24)", fast_frame(extra_u=8),
                    exact_rgbs)
        run_variant("fast C32 K24 (cost 24)", fast_frame(K=24), exact_rgbs)
        run_variant("fast C32 K16+u16 (cost 32)", fast_frame(extra_u=16),
                    exact_rgbs)
        run_variant("fast C64 K32", fast_frame(C=64, K=32), exact_rgbs)
        run_variant("fast C128 K32", fast_frame(C=128, K=32), exact_rgbs)
        run_variant("fast C64 K32 field-cdf",
                    fast_frame(C=64, K=32, score="field"), exact_rgbs)

    # ---- phase 2: quadrature decomposition (negative results kept in the
    # JSON: trapezoid 17.0 dB, subdiv4 19.1 dB — accurate interval optical
    # depth attributes surface absorption to the EMPTY sample before the
    # surface, compositing the field's unconstrained rgb there; the
    # left-rectangle delta rule is load-bearing, so the gap is NOT an
    # integration-rule problem) --------------------------------------------

    if not args.phase4_only:
        # ---- phase 3: hierarchical second stage --------------------------------
        # exact 64+16 holds -0.05 dB because its fine CDF comes from a
        # COMPOSITED field backbone and the backbone samples stay in the
        # composite. Reproduce that structure at fast-path cost: proxy pdf
        # places K1, the field evaluates them, their delta-rule weights build a
        # SECOND CDF, K2 more samples, composite ALL K1+K2 merged.
        def two_stage_frame(C=32, K1=16, K2=16, fdtype=jnp.bfloat16):
            @jax.jit
            def f(tiles):
                def g(rays):
                    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
                    near, far = rays[:, 6:7], rays[:, 7:8]
                    dirn = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
                    r = rays.shape[0]
                    lo = jnp.asarray(aabb[0], jnp.float32)
                    hi = jnp.asarray(aabb[1], jnp.float32)
                    invd = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
                    t_lo, t_hi = (lo - rays_o) * invd, (hi - rays_o) * invd
                    t_min = jnp.max(jnp.minimum(t_lo, t_hi), -1, keepdims=True)
                    t_max = jnp.min(jnp.maximum(t_lo, t_hi), -1, keepdims=True)
                    hits = t_max > jnp.maximum(t_min, 0.0)
                    near_c = jnp.where(hits, jnp.clip(t_min, near, far), near)
                    far_c = jnp.where(hits, jnp.clip(t_max, near, far), far)
                    t = jnp.linspace(0.0, 1.0, C)
                    z = near_c * (1 - t) + far_c * t
                    spacing = (far_c - near_c) / (C - 1)
                    xyz = rays_o[:, None] + rays_d[:, None] * z[..., None]
                    sc = apply_proxy(proxy, xyz, jnp.bfloat16)
                    sig_hat = jnp.expm1(jax.nn.relu(sc.astype(jnp.float32)))
                    a_hat = 1.0 - jnp.exp(-sig_hat * spacing * dirn)
                    tr = jnp.cumprod(1.0 - a_hat + 1e-10, axis=-1)
                    tr = jnp.concatenate(
                        [jnp.ones_like(tr[:, :1]), tr[:, :-1]], -1)
                    w_hat = a_hat * tr
                    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
                    z1 = sample_pdf(z_mid, w_hat[:, 1:-1], K1, rng=None,
                                    det=True, midpoint=True)
                    z1 = jnp.sort(z1, axis=-1)

                    def eval_field(zs):
                        emb = positional_encoding(
                            rays_o[:, None] + rays_d[:, None] * zs[..., None], 10)
                        demb = positional_encoding(rays_d, 4)
                        demb = jnp.broadcast_to(
                            demb[:, None], (r, zs.shape[-1], demb.shape[-1]))
                        return apply_nerf(params["fine"], emb, demb,
                                          cfg=nerf_cfg, compute_dtype=fdtype)

                    raw1 = eval_field(z1)
                    sig1 = jax.nn.relu(raw1[..., 3])
                    d1 = jnp.concatenate(
                        [z1[:, 1:] - z1[:, :-1],
                         jnp.broadcast_to(spacing, (r, 1))], -1) * dirn
                    a1 = 1.0 - jnp.exp(-d1 * sig1)
                    t1 = jnp.cumprod(1.0 - a1 + 1e-10, -1)
                    t1 = jnp.concatenate([jnp.ones_like(t1[:, :1]), t1[:, :-1]],
                                         -1)
                    w1 = a1 * t1
                    z1_mid = 0.5 * (z1[:, :-1] + z1[:, 1:])
                    z2 = sample_pdf(z1_mid, w1[:, 1:-1], K2, rng=None,
                                    det=True, midpoint=True)
                    raw2 = eval_field(z2)
                    z_all = jnp.concatenate([z1, z2], -1)
                    order = jnp.argsort(z_all, -1)
                    z_all = jnp.take_along_axis(z_all, order, -1)
                    raw = jnp.take_along_axis(
                        jnp.concatenate([raw1, raw2], -2), order[..., None], -2)
                    sig = jax.nn.relu(raw[..., 3])
                    deltas = jnp.concatenate(
                        [z_all[:, 1:] - z_all[:, :-1],
                         jnp.broadcast_to(spacing, (r, 1))], -1) * dirn
                    alphas = 1.0 - jnp.exp(-deltas * sig)
                    trans = jnp.cumprod(1.0 - alphas + 1e-10, -1)
                    trans = jnp.concatenate(
                        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
                    wts = alphas * trans
                    rgb = jnp.sum(wts[..., None] * raw[..., :3], -2)
                    return rgb + (1.0 - jnp.sum(wts, -1, keepdims=True))
                return jax.lax.map(g, tiles)
            return f

        run_variant("2stage 16+16 (cost 32)", two_stage_frame(), exact_rgbs)
        run_variant("2stage 8+8 (cost 16)", two_stage_frame(K1=8, K2=8),
                    exact_rgbs)
        run_variant("2stage 12+12 (cost 24)", two_stage_frame(K1=12, K2=12),
                    exact_rgbs)
        run_variant("2stage 16+8 (cost 24)", two_stage_frame(K1=16, K2=8),
                    exact_rgbs)
        run_variant("2stage 8+16 (cost 24)", two_stage_frame(K1=8, K2=16),
                    exact_rgbs)

        # cheaper exact anchors: what backbone resolution does -0.1 dB need?
        def exact_frame2(n_s, n_imp):
            cfg = RenderConfig(n_samples=n_s, n_importance=n_imp, perturb=0.0,
                               noise_std=0.0, white_back=True, test_time=True)

            @jax.jit
            def f(tiles):
                def g(t):
                    return render_rays(params, t, cfg, None, nerf_cfg=nerf_cfg,
                                       compute_dtype=jnp.bfloat16)["rgb_fine"]
                return jax.lax.map(g, tiles)
            return f

        run_variant("exact 32+16", exact_frame2(32, 16), exact_rgbs)
        run_variant("exact 48+16", exact_frame2(48, 16), exact_rgbs)
        run_variant("exact 32+8", exact_frame2(32, 8), exact_rgbs)

    # ---- phase 4: edge-refined fast renderer -------------------------------
    from nerf_siren_tpu.ops.pallas.fused_mlp import pack_model_params
    from nerf_siren_tpu.render.fast import (make_edge_refined_renderer,
                                            render_rays_fast)
    packed = pack_model_params(params, nerf_cfg)

    def base_full_frame(K=16):
        @jax.jit
        def base(rays):
            tiles = rays.reshape(-1, chunk, 8)
            out = jax.lax.map(
                lambda t: render_rays_fast(
                    params, proxy, t, n_candidates=32, n_keep=K,
                    nerf_cfg=nerf_cfg, white_back=True, scene_aabb=aabb,
                    select="pdf", packed_params=packed), tiles)
            return {k: v.reshape(H * W, *v.shape[2:]) for k, v in out.items()}
        return base

    for cap, ns, ni in ((0.02, 48, 16), (0.04, 48, 16), (0.06, 48, 16),
                        (0.04, 32, 16), (0.04, 32, 8)):
        er = make_edge_refined_renderer(
            base_full_frame(), packed, (H, W), nerf_cfg=nerf_cfg,
            white_back=True, n_samples=ns, n_importance=ni, cap_frac=cap)

        def er_frame(ptiles, er=er):
            rays = ptiles.reshape(H * W, 8)
            return er(rays)["rgb_fine"]

        row = run_variant(
            f"edge-ref K16 cap={cap} lite={ns}+{ni}", er_frame, exact_rgbs)
        row["n_refined_last"] = int(np.asarray(er.last_refined))
    er8 = make_edge_refined_renderer(
        base_full_frame(K=8), packed, (H, W), nerf_cfg=nerf_cfg,
        white_back=True, n_samples=48, n_importance=16, cap_frac=0.04)
    run_variant("edge-ref K8 cap=0.04 lite=48+16",
                lambda pt: er8(pt.reshape(H * W, 8))["rgb_fine"], exact_rgbs)

    # ---- error-map localization on pose 0 ----------------------------------
    # Where does the fast-vs-exact squared error live? Classify pixels by
    # the EXACT render's structure: background (opacity<0.01), interior
    # (opacity>0.99 & low local depth variance), silhouette/edge (the rest).
    cfg64 = RenderConfig(n_samples=64, n_importance=64, perturb=0.0,
                         noise_std=0.0, white_back=True, test_time=True)

    @jax.jit
    def exact_full(tiles):
        def g(t):
            out = render_rays(params, t, cfg64, None, nerf_cfg=nerf_cfg,
                              compute_dtype=jnp.bfloat16)
            return out["rgb_fine"], out["depth_fine"], out["opacity_fine"]
        return jax.lax.map(g, tiles)

    rgb_e, depth_e, opac_e = (np.asarray(x) for x in exact_full(pose_tiles[0]))
    rgb_e = rgb_e.reshape(H, W, 3)
    depth_e = depth_e.reshape(H, W)
    opac_e = opac_e.reshape(H, W)
    rgb_f = np.asarray(fast_frame()(pose_tiles[0])).reshape(H, W, 3)
    err2 = np.sum((rgb_f - rgb_e) ** 2, -1)
    # edge = dilated high-gradient band of exact depth*opacity
    grad = np.abs(np.diff(opac_e, axis=0, prepend=opac_e[:1])) + \
        np.abs(np.diff(opac_e, axis=1, prepend=opac_e[:, :1])) + \
        0.5 * (np.abs(np.diff(depth_e * opac_e, axis=0,
                              prepend=(depth_e * opac_e)[:1]))
               + np.abs(np.diff(depth_e * opac_e, axis=1,
                                prepend=(depth_e * opac_e)[:, :1])))
    edge = grad > 0.1
    for _ in range(2):  # dilate 2px
        edge = (edge | np.roll(edge, 1, 0) | np.roll(edge, -1, 0)
                | np.roll(edge, 1, 1) | np.roll(edge, -1, 1))
    bg = (opac_e < 0.01) & ~edge
    interior = (opac_e > 0.99) & ~edge
    other = ~(bg | interior | edge)
    emap = {}
    for name, mask in (("edge", edge), ("interior", interior),
                       ("background", bg), ("other", other)):
        emap[name] = {"pixel_frac": float(mask.mean()),
                      "err2_share": float(err2[mask].sum() / err2.sum()),
                      "mean_err2": float(err2[mask].mean())}
        print(f"err-map {name:11s}: {emap[name]['pixel_frac']*100:5.1f}% of "
              f"pixels, {emap[name]['err2_share']*100:5.1f}% of fast-vs-exact "
              f"error", flush=True)
    results["error_map_pose0"] = emap

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if args.phase2_only and os.path.exists(args.out):
        old = json.load(open(args.out))
        seen = {r["label"] for r in results["rows"]}
        results["rows"] = ([r for r in old.get("rows", [])
                            if r["label"] not in seen] + results["rows"])
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
