"""On-chip benchmark: Pallas triplane tile-gather kernel vs the jnp
block-gather ceiling (VERDICT r4 item 4).

Measures plane-samples/s on a realistic EG3D eval pattern — one camera's
raster frame marching stratified depths (raster order is what eval/
eval_eg3d.py render; bench.py's random-shell rays are NOT raster-coherent
and represent the worst case the group fallback handles, also measured
here). Sweeps group/tile shapes and reports miss rates, then times the
full importance_render both ways.

Writes docs/triplane_gather_bench.json.
Run (chip): python tools/triplane_gather_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.render.triplane import (
        RenderingOptions, importance_render, init_osg_decoder,
        make_kernel_plane_sampler, pack_planes_for_sampling,
        sample_from_packed_planes)

    rng = np.random.default_rng(0)
    C, H, W = 32, 256, 256
    planes = jnp.asarray(rng.normal(size=(1, 3, C, H, W)), jnp.float32)
    packed = pack_planes_for_sampling(planes, dtype=jnp.bfloat16)

    # one camera, 128x128 raster, EG3D-ish geometry (radius-4 eye,
    # box_warp 15, depths 0.1..10 — eg3d_renderer.py's hardcoded kwargs)
    side = 128
    R = side * side
    S = 64
    eye = np.array([2.6, 1.8, 2.2], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    ii, jj = np.meshgrid(np.arange(side), np.arange(side))
    uv = np.stack([(ii.reshape(-1) - side / 2) / (side * 1.2),
                   (jj.reshape(-1) - side / 2) / (side * 1.2)], -1)
    d = (uv[:, :1] * right + uv[:, 1:2] * up + fwd).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(0.1, 10.0, S, dtype=np.float32)
    pts = eye + d[:, None, :] * t[None, :, None]            # (R, S, 3)
    coords = jnp.asarray(pts.reshape(1, R * S, 3))
    box_warp = 15.0
    m_total = 3 * R * S

    def sync(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)[..., :2]))

    def timeit(fn, arg, n=3, warm=25):
        for _ in range(warm):
            out = fn(arg)
        sync(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(arg)
            sync(out)
            ts.append(time.perf_counter() - t0)
        return out, float(np.median(ts))

    results = {"R": R, "S": S, "C": C, "plane_hw": H}

    jnp_fn = jax.jit(lambda cds: sample_from_packed_planes(
        packed, cds, box_warp))
    _, t_jnp = timeit(jnp_fn, coords)
    results["jnp_block_gather_samples_per_sec"] = m_total / t_jnp
    print(f"jnp packed bf16: {m_total / t_jnp / 1e6:8.1f} M samples/s",
          flush=True)

    results["kernel"] = []
    for rb, sb, th, tpx in ((64, 8, 128, 32), (128, 4, 128, 32),
                            (32, 16, 128, 32), (64, 8, 64, 32),
                            (64, 8, 128, 64), (256, 2, 128, 32),
                            (128, 8, 128, 32)):
        try:
            sampler = make_kernel_plane_sampler(
                packed, box_warp, R, S, rb=rb, sb=sb, tile_h=th, tile_px=tpx)
            kfn = jax.jit(lambda cds, s=sampler: s(cds))
            _, t_k = timeit(kfn, coords)
            # miss stats only materialize on an EAGER call (the sampler
            # guards its diagnostics against tracer leaks under jit)
            sampler(coords)
            miss = int(np.asarray(sampler.last_miss_groups))
            over = bool(np.asarray(sampler.last_miss_overflow))
            row = {"rb": rb, "sb": sb, "tile_h": th, "tile_px": tpx,
                   "samples_per_sec": m_total / t_k,
                   "miss_groups": miss, "miss_overflow": over}
            results["kernel"].append(row)
            print(f"kernel rb={rb:3d} sb={sb:2d} tile={th}x{tpx}: "
                  f"{m_total / t_k / 1e6:8.1f} M samples/s  miss={miss}"
                  f"{' OVERFLOW' if over else ''}", flush=True)
        except Exception as e:  # keep sweeping on Mosaic lowering failures
            print(f"kernel rb={rb} sb={sb} tile={th}x{tpx}: FAILED {e}",
                  flush=True)
            results["kernel"].append(
                {"rb": rb, "sb": sb, "tile_h": th, "tile_px": tpx,
                 "error": str(e)[:500]})

    # numeric agreement of the best CORRECT kernel config vs the jnp path
    # (overflowing-miss configs return zeros for the dropped groups)
    best = max((r for r in results["kernel"]
                if "samples_per_sec" in r and not r["miss_overflow"]),
               key=lambda r: r["samples_per_sec"], default=None)
    if best:
        sampler = make_kernel_plane_sampler(
            packed, box_warp, R, S, rb=best["rb"], sb=best["sb"],
            tile_h=best["tile_h"], tile_px=best["tile_px"])
        ref = np.asarray(jnp_fn(coords), np.float32)
        got = np.asarray(jax.jit(lambda c: sampler(c))(coords), np.float32)
        err = float(np.max(np.abs(got - ref)))
        results["best_max_abs_err_vs_jnp"] = err
        print(f"best-config max|err| vs jnp bf16 path: {err:.2e}", flush=True)

        # full importance_render through the kernel sampler
        dec = init_osg_decoder(jax.random.PRNGKey(0), n_features=C)
        opts = RenderingOptions(depth_resolution=S,
                                depth_resolution_importance=S,
                                ray_start=0.1, ray_end=10.0,
                                box_warp=box_warp)
        ray_o = jnp.asarray(np.broadcast_to(eye, d.shape))[None]
        ray_d = jnp.asarray(d)[None]

        def render(way):
            smp = sampler if way == "kernel" else None

            @jax.jit
            def f(args):
                o, dd = args
                return importance_render(packed, dec, o, dd, opts,
                                         packed=True, sampler=smp)[3]
            return f

        _, t_ref = timeit(render("jnp"), (ray_o, ray_d))
        _, t_ker = timeit(render("kernel"), (ray_o, ray_d))
        results["render_jnp_rays_per_sec"] = R / t_ref
        results["render_kernel_rays_per_sec"] = R / t_ker
        print(f"importance_render 64+64: jnp {R / t_ref / 1e3:.1f}K rays/s"
              f" -> kernel {R / t_ker / 1e3:.1f}K rays/s "
              f"({t_ref / t_ker:.2f}x)", flush=True)

    with open("docs/triplane_gather_bench.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote docs/triplane_gather_bench.json", flush=True)


if __name__ == "__main__":
    main()
