"""Export a .vol density volume for Unity Texture3D volume rendering
(the capability of the reference's extract_mesh.ipynb "Generate .vol" cell,
see docs/unity.md for the binary layout).
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
import struct

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", required=True)
    parser.add_argument("--N_grid", type=int, default=512)
    parser.add_argument("--x_range", nargs="+", type=float, default=[-1.2, 1.2])
    parser.add_argument("--y_range", nargs="+", type=float, default=None)
    parser.add_argument("--z_range", nargs="+", type=float, default=None)
    parser.add_argument("--sigma_max", type=float, default=100.0,
                        help="sigma mapped to 255 in the quantized volume")
    parser.add_argument("--chunk", type=int, default=65536)
    parser.add_argument("--out", default="scene.vol")
    args = parser.parse_args()
    args.y_range = args.y_range or args.x_range
    args.z_range = args.z_range or args.x_range

    import jax

    from extract_color_mesh import predict_sigma_grid
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.training.checkpoints import load_ckpt

    fine = load_ckpt(init_nerf(jax.random.PRNGKey(0)), args.ckpt_path, "nerf_fine")
    sigma, spacing, origin = predict_sigma_grid(fine, args)

    q = np.clip(sigma / args.sigma_max, 0, 1)
    q = (q * 255).astype(np.uint8)
    n = args.N_grid
    bb_min = np.asarray(origin, np.float32)
    bb_max = bb_min + np.asarray(spacing, np.float32) * (n - 1)

    with open(args.out, "wb") as f:
        f.write(struct.pack("<3i", n, n, n))
        f.write(bb_min.tobytes())
        f.write(bb_max.tobytes())
        f.write(q.tobytes())
    print(f"wrote {args.out}: {n}^3 voxels, bbox {bb_min.tolist()} .. {bb_max.tolist()}")


if __name__ == "__main__":
    main()
