"""Mesh extraction CLI (reference: extract_color_mesh.py).

Dense sigma grid over a user box → iso-surface (marching tetrahedra, see
nerf_siren_tpu.mesh.marching for the divergence note vs PyMCubes) → optional
largest-cluster denoise → vertex colors by one of:
- 'fusion' (default): occlusion-aware per-image color fusion — project
  vertices into every training image, weight colors by visibility (opacity of
  the camera→vertex ray below --occ_threshold) plus an inverse-depth prior
  (reference :209-305),
- 'normal': query the radiance field at each vertex looking along the inward
  normal (the vertex-normal method of reference :190-207, evaluated as a
  field query instead of a full ray march),
- 'label': colorize by the semantic palette from a labels/ dir
  (reference :218-241).
Writes a colored binary PLY.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def get_opts(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--root_dir', type=str, required=True)
    parser.add_argument('--dataset_name', type=str, default='blender',
                        choices=['blender', 'blender_cls_ib', 'llff', 'replica'])
    parser.add_argument('--scene_name', type=str, default='scene')
    parser.add_argument('--img_wh', nargs='+', type=int, default=[800, 800])
    parser.add_argument('--ckpt_path', type=str, required=True)
    parser.add_argument('--N_grid', type=int, default=256)
    parser.add_argument('--x_range', nargs='+', type=float, default=[-1.2, 1.2])
    parser.add_argument('--y_range', nargs='+', type=float, default=[-1.2, 1.2])
    parser.add_argument('--z_range', nargs='+', type=float, default=[-1.2, 1.2])
    parser.add_argument('--sigma_threshold', type=float, default=20.0)
    parser.add_argument('--occ_threshold', type=float, default=0.2)
    parser.add_argument('--chunk', type=int, default=32 * 1024)
    parser.add_argument('--N_samples', type=int, default=64)
    parser.add_argument('--vis_type', type=str, default='fusion',
                        choices=['fusion', 'normal', 'label'])
    parser.add_argument('--keep_largest', default=False, action='store_true',
                        help='largest-connected-component denoise')
    parser.add_argument('--out_dir', type=str, default='results/meshes')
    return parser.parse_args(args)


def predict_sigma_grid(params, hparams):
    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.models.embedding import positional_encoding
    from nerf_siren_tpu.models.nerf import apply_nerf

    N = hparams.N_grid
    x = np.linspace(*hparams.x_range, N)
    y = np.linspace(*hparams.y_range, N)
    z = np.linspace(*hparams.z_range, N)
    xyz = np.stack(np.meshgrid(x, y, z, indexing='ij'), -1).reshape(-1, 3).astype(np.float32)

    @jax.jit
    def sigma_fn(params, pts):
        emb = positional_encoding(pts, 10)
        return apply_nerf(params, emb, None)[:, 0]

    out = []
    for i in range(0, xyz.shape[0], hparams.chunk):
        out.append(np.asarray(sigma_fn(params, jnp.asarray(xyz[i:i + hparams.chunk]))))
    sigma = np.maximum(np.concatenate(out), 0).reshape(N, N, N)
    spacing = ((x[-1] - x[0]) / (N - 1), (y[-1] - y[0]) / (N - 1), (z[-1] - z[0]) / (N - 1))
    origin = (x[0], y[0], z[0])
    return sigma, spacing, origin


def fuse_colors(params, dataset, verts, hparams):
    """Occlusion-aware color fusion (reference extract_color_mesh.py:209-305)."""
    import cv2
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig
    from nerf_siren_tpu.render.rendering import render_rays_chunked

    W, H = hparams.img_wh
    K = np.array([[dataset.focal, 0, W / 2],
                  [0, dataset.focal, H / 2],
                  [0, 0, 1]], np.float32)
    n_v = len(verts)
    verts_homo = np.concatenate([verts, np.ones((n_v, 1))], 1)
    non_occluded_sum = np.zeros((n_v, 1))
    v_color_sum = np.zeros((n_v, 3))

    cfg = RenderConfig(n_samples=hparams.N_samples, n_importance=0,
                       perturb=0.0, noise_std=0.0, test_time=True,
                       chunk=hparams.chunk)

    @jax.jit
    def opacity_fn(params, rays):
        return render_rays_chunked(params, rays, cfg, None)["opacity_coarse"]

    poses = dataset.poses
    for idx in range(len(dataset.image_paths)):
        if hparams.vis_type == 'label':
            from nerf_siren_tpu.utils.color import colorize_cls
            parse_path = dataset.image_paths[idx].replace('train', 'labels')
            parse = np.asarray(Image.open(parse_path)) / 10
            parse = cv2.resize(parse, (W, H), interpolation=cv2.INTER_NEAREST)
            image = colorize_cls(parse.astype(np.uint8)).astype(np.float32)
        else:
            image = Image.open(dataset.image_paths[idx]).convert('RGB')
            image = np.array(image.resize((W, H), Image.LANCZOS), np.float32)

        P_c2w = np.concatenate([poses[idx], [[0, 0, 0, 1]]], 0)
        P_w2c = np.linalg.inv(P_c2w)[:3]
        v_cam = P_w2c @ verts_homo.T                    # (3, N), "right up back"
        v_cam[1:] *= -1                                 # → "right down forward"
        v_img = (K @ v_cam).T
        depth = v_img[:, -1:] + 1e-5
        v_img = (v_img[:, :2] / depth).astype(np.float32)
        v_img[:, 0] = np.clip(v_img[:, 0], 0, W - 1)
        v_img[:, 1] = np.clip(v_img[:, 1], 0, H - 1)

        colors = []
        for i in range(0, n_v, 30000):
            # maps must be 2-D (N, 1): with 1-D maps cv2.remap treats them as
            # one row and returns a single pixel row
            colors.append(cv2.remap(image,
                                    v_img[i:i + 30000, 0:1],
                                    v_img[i:i + 30000, 1:2],
                                    interpolation=cv2.INTER_LINEAR)[:, 0])
        colors = np.vstack(colors)

        rays_o = np.broadcast_to(poses[idx][:, -1], (n_v, 3)).astype(np.float32)
        rays_d = verts - rays_o
        rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        near = np.full((n_v, 1), float(dataset.bounds.min()), np.float32)
        far = depth.astype(np.float32)
        rays = np.concatenate([rays_o, rays_d, near, far], 1)
        opacity = np.asarray(opacity_fn(params, jnp.asarray(rays)))[:, None]
        opacity = np.nan_to_num(opacity, nan=1.0)

        non_occluded = np.ones_like(non_occluded_sum) * 0.1 / depth
        non_occluded += opacity < hparams.occ_threshold
        v_color_sum += colors * non_occluded
        non_occluded_sum += non_occluded
        print(f'fused image {idx + 1}/{len(dataset.image_paths)}', flush=True)

    return (v_color_sum / non_occluded_sum / 255.0).clip(0, 1)


def normal_colors(params, verts, faces):
    """Field query along the inward vertex normal."""
    import jax
    import jax.numpy as jnp

    from nerf_siren_tpu.models.embedding import positional_encoding
    from nerf_siren_tpu.models.nerf import apply_nerf

    tri = verts[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    vn /= np.linalg.norm(vn, axis=-1, keepdims=True) + 1e-8

    @jax.jit
    def rgb_fn(params, pts, dirs):
        emb = positional_encoding(pts, 10)
        demb = positional_encoding(dirs, 4)
        return apply_nerf(params, emb, demb)[:, :3]

    out = []
    for i in range(0, len(verts), 32768):
        out.append(np.asarray(rgb_fn(params, jnp.asarray(verts[i:i + 32768]),
                                     jnp.asarray(-vn[i:i + 32768]))))
    return np.concatenate(out)


def main(hparams):
    import jax

    from nerf_siren_tpu.datasets import dataset_dict
    from nerf_siren_tpu.mesh.marching import (
        largest_connected_component,
        marching_tetrahedra,
    )
    from nerf_siren_tpu.mesh.ply import write_ply
    from nerf_siren_tpu.models.nerf import init_nerf
    from nerf_siren_tpu.training.checkpoints import load_ckpt

    kwargs = dict(root_dir=hparams.root_dir, img_wh=tuple(hparams.img_wh))
    if hparams.dataset_name == 'llff':
        kwargs.update(spheric_poses=True, split='test')
    else:
        kwargs['split'] = 'train'
    dataset = dataset_dict[hparams.dataset_name](**kwargs)

    fine = load_ckpt(init_nerf(jax.random.PRNGKey(0)), hparams.ckpt_path, 'nerf_fine')
    params = {'coarse': fine, 'fine': fine}

    print('Predicting occupancy ...', flush=True)
    sigma, spacing, origin = predict_sigma_grid(fine, hparams)

    print('Extracting mesh ...', flush=True)
    verts, faces = marching_tetrahedra(sigma, hparams.sigma_threshold,
                                       spacing=spacing, origin=origin)
    print(f'  {len(verts)} vertices, {len(faces)} faces', flush=True)
    if hparams.keep_largest and len(verts):
        verts, faces, _ = largest_connected_component(verts, faces)
        print(f'  kept largest component: {len(verts)} vertices', flush=True)

    if len(verts) == 0:
        colors = None
    elif hparams.vis_type == 'normal':
        colors = normal_colors(fine, verts, faces)
    else:
        colors = fuse_colors(params, dataset, verts, hparams)

    os.makedirs(hparams.out_dir, exist_ok=True)
    out_path = os.path.join(hparams.out_dir, f'{hparams.scene_name}.ply')
    write_ply(out_path, verts, faces, colors)
    print(f'wrote {out_path}', flush=True)
    return out_path


if __name__ == '__main__':
    main(get_opts())
