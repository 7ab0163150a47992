"""Single-image inference walkthrough — the headless version of the
reference's test.ipynb: load a checkpoint, render one validation view, report
PSNR and timing, save the rgb + JET-depth images.

python examples/render_single_image.py --root_dir ... --ckpt_path ... \
    [--dataset_name blender --img_wh 400 400 --idx 0]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS=cpu even on machines whose sitecustomize
# force-registers a TPU platform (env alone is ignored there; tests rely
# on this to stay off a possibly-unreachable tunneled device)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


import argparse
import os
import time

import imageio
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root_dir", required=True)
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--dataset_name", default="blender")
    parser.add_argument("--split", default="val")
    parser.add_argument("--img_wh", nargs="+", type=int, default=[400, 400])
    parser.add_argument("--idx", type=int, default=0)
    parser.add_argument("--N_samples", type=int, default=64)
    parser.add_argument("--N_importance", type=int, default=64)
    parser.add_argument("--out_dir", default="results/single")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig
    from nerf_siren_tpu.datasets import dataset_dict
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.render.rendering import render_rays_chunked
    from nerf_siren_tpu.training.checkpoints import load_ckpt
    from nerf_siren_tpu.training.metrics import psnr
    from nerf_siren_tpu.utils.visualization import visualize_depth

    w, h = args.img_wh
    ds = dataset_dict[args.dataset_name](root_dir=args.root_dir,
                                         split=args.split,
                                         img_wh=tuple(args.img_wh))
    sample = ds[args.idx]

    nerf_cfg = NeRFConfig()
    params = {"coarse": load_ckpt(init_nerf(jax.random.PRNGKey(0)),
                                  args.ckpt_path, "nerf_coarse")}
    if args.N_importance > 0:
        params["fine"] = load_ckpt(init_nerf(jax.random.PRNGKey(1)),
                                   args.ckpt_path, "nerf_fine")
    cfg = RenderConfig(n_samples=args.N_samples, n_importance=args.N_importance,
                       perturb=0.0, noise_std=0.0, white_back=ds.white_back,
                       test_time=args.N_importance > 0)

    @jax.jit
    def render(params, rays):
        return render_rays_chunked(params, rays, cfg, None, nerf_cfg=nerf_cfg,
                                   compute_dtype=jnp.bfloat16)

    rays = jnp.asarray(sample["rays"])
    out = render(params, rays)                     # compile
    key = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
    float(jnp.sum(out[key]))
    t0 = time.perf_counter()
    out = render(params, rays)
    float(jnp.sum(out[key]))
    dt = time.perf_counter() - t0

    pred = np.asarray(out[key], np.float32).reshape(h, w, 3)
    depth = np.asarray(out[key.replace("rgb", "depth")], np.float32).reshape(h, w)
    print(f"render time: {dt * 1000:.1f} ms ({rays.shape[0] / dt / 1e3:.0f}K rays/s)")
    if "rgbs" in sample:
        gt = sample["rgbs"].reshape(h, w, 3)
        print(f"PSNR: {float(psnr(jnp.asarray(pred), jnp.asarray(gt))):.2f} dB")

    os.makedirs(args.out_dir, exist_ok=True)
    imageio.imwrite(os.path.join(args.out_dir, "rgb.png"),
                    (np.clip(pred, 0, 1) * 255).astype(np.uint8))
    imageio.imwrite(os.path.join(args.out_dir, "depth.png"),
                    visualize_depth(depth))
    print(f"wrote {args.out_dir}/rgb.png and depth.png")


if __name__ == "__main__":
    main()
