"""EG3D mesh extraction CLI (reference: extract_color_mesh_eg3d.py).

Samples sigma from the trained triplane renderer over a cube (256³ default),
pads the border with -1000 so the iso-surface closes (reference :199-207),
runs marching tetrahedra, and writes a PLY (optionally colored by the
decoder's rgb at each vertex).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def get_opts(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--ckpt_path', type=str, required=True)
    parser.add_argument('--scene_name', type=str, default='scene_eg3d')
    parser.add_argument('--N_grid', type=int, default=256)
    parser.add_argument('--cube_length', type=float, default=2.0,
                        help='side length of the sampled cube (world units)')
    parser.add_argument('--sigma_threshold', type=float, default=10.0)
    parser.add_argument('--chunk', type=int, default=65536)
    parser.add_argument('--colorize', default=False, action='store_true')
    parser.add_argument('--out_dir', type=str, default='results/meshes')
    parser.add_argument('--eg3d_plane_res', type=int, default=256)
    parser.add_argument('--eg3d_channel_base', type=int, default=32768)
    parser.add_argument('--eg3d_channel_max', type=int, default=512)
    parser.add_argument('--eg3d_z_dim', type=int, default=512)
    parser.add_argument('--eg3d_box_warp', type=float, default=15.0)
    return parser.parse_args(args)


def main(hparams):
    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.mesh.marching import marching_tetrahedra
    from nerf_siren_tpu.mesh.ply import write_ply
    from nerf_siren_tpu.render.triplane import (
        TriPlaneConfig, eg3d_sample, init_eg3d_renderer,
    )
    from nerf_siren_tpu.training.checkpoints import load_ckpt

    from nerf_siren_tpu.render.triplane import RenderingOptions
    cfg = TriPlaneConfig(
        z_dim=hparams.eg3d_z_dim, w_dim=hparams.eg3d_z_dim,
        plane_resolution=hparams.eg3d_plane_res,
        channel_base=hparams.eg3d_channel_base,
        channel_max=hparams.eg3d_channel_max,
        rendering=RenderingOptions(box_warp=hparams.eg3d_box_warp))
    params = init_eg3d_renderer(jax.random.PRNGKey(0), cfg)
    params = load_ckpt(params, hparams.ckpt_path, 'eg3d_renderer')

    N = hparams.N_grid
    half = hparams.cube_length / 2
    lin = np.linspace(-half, half, N, dtype=np.float32)
    xyz = np.stack(np.meshgrid(lin, lin, lin, indexing='ij'), -1).reshape(-1, 3)

    @jax.jit
    def sample_fn(params, pts):
        return eg3d_sample(params, cfg, pts)["sigma"][0, :, 0]

    print('Sampling sigma ...', flush=True)
    out = []
    for i in range(0, xyz.shape[0], hparams.chunk):
        out.append(np.asarray(sample_fn(params, jnp.asarray(xyz[i:i + hparams.chunk]))))
    sigma = np.concatenate(out).reshape(N, N, N)

    # close the surface at the border (reference :199-207)
    pad = -1000.0
    sigma[:1] = sigma[-1:] = pad
    sigma[:, :1] = sigma[:, -1:] = pad
    sigma[:, :, :1] = sigma[:, :, -1:] = pad

    print('Extracting mesh ...', flush=True)
    step = hparams.cube_length / (N - 1)
    verts, faces = marching_tetrahedra(sigma, hparams.sigma_threshold,
                                       spacing=(step,) * 3,
                                       origin=(-half, -half, -half))
    print(f'  {len(verts)} vertices, {len(faces)} faces', flush=True)

    colors = None
    if hparams.colorize and len(verts):
        @jax.jit
        def rgb_fn(params, pts):
            return eg3d_sample(params, cfg, pts)["rgb"][0]
        cols = []
        for i in range(0, len(verts), hparams.chunk):
            cols.append(np.asarray(rgb_fn(params, jnp.asarray(verts[i:i + hparams.chunk]))))
        colors = np.concatenate(cols).clip(0, 1)

    os.makedirs(hparams.out_dir, exist_ok=True)
    out_path = os.path.join(hparams.out_dir, f'{hparams.scene_name}.ply')
    write_ply(out_path, verts, faces, colors)
    print(f'wrote {out_path}', flush=True)
    return out_path


if __name__ == '__main__':
    main(get_opts())
