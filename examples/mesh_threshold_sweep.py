"""Mesh-extraction parameter search — the headless version of the reference's
extract_mesh.ipynb: sweep sigma thresholds over a coarse grid and report mesh
statistics so the user can pick --sigma_threshold for extract_color_mesh.py.

python examples/mesh_threshold_sweep.py --ckpt_path ... \
    [--N_grid 128 --thresholds 5 10 20 50]
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

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--N_grid", type=int, default=128)
    parser.add_argument("--x_range", nargs="+", type=float, default=[-1.2, 1.2])
    parser.add_argument("--thresholds", nargs="+", type=float,
                        default=[2, 5, 10, 20, 50])
    args = parser.parse_args()
    args.y_range = args.z_range = args.x_range
    args.chunk = 65536

    import jax

    from extract_color_mesh import predict_sigma_grid
    from nerf_siren_tpu.mesh.marching import (
        largest_connected_component, marching_tetrahedra)
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.training.checkpoints import load_ckpt

    fine = load_ckpt(init_nerf(jax.random.PRNGKey(0)), args.ckpt_path, "nerf_fine")
    sigma, spacing, origin = predict_sigma_grid(fine, args)
    print(f"sigma grid {sigma.shape}: min={sigma.min():.2f} "
          f"mean={sigma.mean():.2f} max={sigma.max():.2f}")

    print(f"{'threshold':>10} {'vertices':>10} {'faces':>10} {'largest-cc':>10}")
    for t in args.thresholds:
        verts, faces = marching_tetrahedra(sigma, t, spacing, origin)
        if len(verts):
            v2, f2, _ = largest_connected_component(verts, faces)
            frac = len(f2) / max(len(faces), 1)
        else:
            frac = 0.0
        print(f"{t:>10.1f} {len(verts):>10} {len(faces):>10} {frac:>9.0%}")


if __name__ == "__main__":
    main()
