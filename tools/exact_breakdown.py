"""Attribute the exact fused path's frame time (VERDICT r4 item 8).

The exact renderer runs at ~520K rays/s while the field kernel alone
measures 81–83% of practical peak — ~36% of frame time was unattributed.
Perfetto over the tunneled runtime is unreliable, so this uses ablation
bisection: time jitted sub-programs that share operands and subtract.

  t_kernels   sigma kernel (n_samples) + full kernel (n_samples+n_imp) at
              precomputed coordinates — the pure compute floor
  t_nopdf     full pipeline with the hierarchical resample replaced by
              uniform fine depths (no sample_pdf, no merge sort)
  t_full      render_rays_fused as shipped

  pdf+sort  = t_full − t_nopdf
  composite+coords+reassembly = t_nopdf − t_kernels

Writes docs/exact_breakdown.json.
Run (chip): python tools/exact_breakdown.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fast_frontier import look_at, make_rays  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.ops.pallas import fused_mlp
    from nerf_siren_tpu.ops.pallas.fused_mlp import (IN_ROWS, SIGMA_ROW,
                                                     fused_full_t,
                                                     fused_sigma_t,
                                                     pack_model_params)
    from nerf_siren_tpu.render.fused import render_rays_fused
    from nerf_siren_tpu.render.rendering import composite, stratified_z_vals
    from nerf_siren_tpu.ops.sample_pdf import sample_pdf

    H = W = 800
    n_s, n_i = 64, 128
    cfg = NeRFConfig()
    params = {"coarse": init_nerf(jax.random.PRNGKey(0), cfg),
              "fine": init_nerf(jax.random.PRNGKey(1), cfg)}
    packed = pack_model_params(params, cfg)
    rcfg = RenderConfig(n_samples=n_s, n_importance=n_i, perturb=0.0,
                        noise_std=0.0, white_back=True, test_time=True)

    focal = 0.5 * 800 / np.tan(0.5 * 0.6911112)
    eye = 4.0 * np.array([np.cos(1.1) * np.cos(-0.25),
                          np.sin(1.1) * np.cos(-0.25), np.sin(-0.25)])
    rays = make_rays(look_at(eye), eye, H, W, focal)
    chunk = 40_000
    tiles = jnp.asarray(rays.reshape(-1, chunk, 8))

    def timeit(f, n=3, warm=25):
        for _ in range(warm):
            out = f(tiles)
        float(jnp.sum(out))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = f(tiles)
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    depth, skips = cfg.depth, cfg.skips

    def pad_n(xT):
        return jnp.pad(xT, ((0, 0), (0, -xT.shape[1] % fused_mlp.TILE_N)))

    def per_tile_parts(t, mode):
        r = t.shape[0]
        oT8 = jnp.pad(t[:, 0:3].T, ((0, IN_ROWS - 3), (0, 0)))
        dT8 = jnp.pad(t[:, 3:6].T, ((0, IN_ROWS - 3), (0, 0)))
        near, far = t[:, 6:7], t[:, 7:8]
        dir_norm = jnp.linalg.norm(t[:, 3:6], axis=-1, keepdims=True)
        z_vals = stratified_z_vals(near, far, n_s)
        xyzT = pad_n((oT8[:, :, None] + dT8[:, :, None]
                      * z_vals[None]).reshape(IN_ROWS, -1))
        sig8 = fused_sigma_t(packed["coarse"], xyzT, depth=depth, skips=skips)
        if mode == "sigma_only":
            return jnp.sum(sig8[SIGMA_ROW])
        s_all = n_s + n_i
        if mode == "kernels":
            # fixed uniform merged depths: no composite, no pdf, no sort
            tt = jnp.linspace(0.0, 1.0, s_all)
            z_all = near * (1 - tt) + far * tt
        else:  # nopdf: composite coarse, uniform fine, merge-free sorted z
            comp_c = composite(sig8[SIGMA_ROW, : r * n_s].reshape(r, n_s),
                               z_vals, dir_norm)
            tt = jnp.linspace(0.0, 1.0, s_all)
            z_all = (near * (1 - tt) + far * tt
                     + 0.0 * comp_c["opacity"][:, None])
        xyzT = pad_n((oT8[:, :, None] + dT8[:, :, None]
                      * z_all[None]).reshape(IN_ROWS, -1))
        dirT = pad_n(jnp.broadcast_to(
            dT8[:, :, None], (IN_ROWS, r, s_all)).reshape(IN_ROWS, -1))
        out8 = fused_full_t(packed["fine"], xyzT, dirT, depth=depth,
                            skips=skips)
        if mode == "kernels":
            return jnp.sum(out8[SIGMA_ROW])
        sig_f = out8[SIGMA_ROW, : r * s_all].reshape(r, s_all)
        comp_f = composite(sig_f, z_all, dir_norm)
        rgbT = out8[:3, : r * s_all].reshape(3, r, s_all)
        rgb = jnp.sum(comp_f["weights"][None] * rgbT, axis=-1).T
        return jnp.sum(rgb + (1.0 - comp_f["opacity"][:, None]))

    results = {}

    @jax.jit
    def full(tl):
        return jax.lax.map(
            lambda t: jnp.sum(render_rays_fused(packed, t, rcfg,
                                                nerf_cfg=cfg)["rgb_fine"]),
            tl)
    t_full = timeit(full)
    results["t_full_s"] = t_full
    print(f"full frame        : {t_full*1e3:7.1f} ms "
          f"({H*W/t_full/1e3:.0f}K rays/s)", flush=True)

    for mode in ("nopdf", "kernels", "sigma_only"):
        @jax.jit
        def f(tl, mode=mode):
            return jax.lax.map(lambda t: per_tile_parts(t, mode), tl)
        tm = timeit(f)
        results[f"t_{mode}_s"] = tm
        print(f"{mode:18s}: {tm*1e3:7.1f} ms", flush=True)

    results["attribution_ms"] = {
        "pdf_plus_sort": (results["t_full_s"] - results["t_nopdf_s"]) * 1e3,
        "composite_coords_reassembly":
            (results["t_nopdf_s"] - results["t_kernels_s"]) * 1e3,
        "kernels_total": results["t_kernels_s"] * 1e3,
        "sigma_kernel": results["t_sigma_only_s"] * 1e3,
        "fine_kernel_plus_coords":
            (results["t_kernels_s"] - results["t_sigma_only_s"]) * 1e3,
    }
    print(json.dumps(results["attribution_ms"], indent=1), flush=True)
    with open("docs/exact_breakdown.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote docs/exact_breakdown.json", flush=True)


if __name__ == "__main__":
    main()
