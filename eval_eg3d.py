"""EG3D evaluation / rendering CLI (reference: eval_eg3d.py:22-135).

Loads the eg3d_renderer params (TriPlane backbone + decoder + learnable z)
from a checkpoint, renders every test item in 4096-ray chunks, writes PNG
frames + GIF and the mean PSNR when ground truth exists.
"""
from __future__ import annotations

import argparse
import os

import imageio
import numpy as np


def get_opts(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--root_dir', type=str, required=True)
    parser.add_argument('--dataset_name', type=str, default='blender',
                        choices=['blender', 'llff', 'replica'])
    parser.add_argument('--scene_name', type=str, default='test_eg3d')
    parser.add_argument('--split', type=str, default='test')
    parser.add_argument('--img_wh', nargs='+', type=int, default=[128, 128])
    parser.add_argument('--spheric_poses', default=False, action='store_true')
    parser.add_argument('--chunk', type=int, default=4096)
    parser.add_argument('--num_chips', type=int, default=1,
                        help='shard each frame over N chips for the exact '
                             'renderer (0 = all available)')
    parser.add_argument('--ckpt_path', type=str, required=True)
    parser.add_argument('--eg3d_plane_res', type=int, default=256)
    parser.add_argument('--eg3d_channel_base', type=int, default=32768)
    parser.add_argument('--eg3d_channel_max', type=int, default=512)
    parser.add_argument('--eg3d_z_dim', type=int, default=512)
    parser.add_argument('--N_samples', type=int, default=64)
    parser.add_argument('--N_importance', type=int, default=64)
    parser.add_argument('--eg3d_ray_start', type=float, default=0.1)
    parser.add_argument('--eg3d_ray_end', type=float, default=10.0)
    parser.add_argument('--eg3d_box_warp', type=float, default=15.0)
    parser.add_argument('--plane_sampler', type=str, default='gather',
                        choices=['gather', 'kernel'],
                        help="'kernel' samples the triplanes through the "
                             "Pallas tile-gather kernel "
                             "(ops/pallas/triplane_gather.py) instead of "
                             "the jnp block-gather table — exact-path "
                             "eval accelerator for raster frames "
                             "(docs/triplane_gather_bench.json)")
    parser.add_argument('--renderer', type=str, default='exact',
                        choices=['exact', 'fast'],
                        help='fast: proxy-culled K-sample renderer '
                             '(render/triplane_fast.py) — distills a density '
                             'proxy once per scene, then gathers plane '
                             'features only at K proxy-placed samples/ray')
    parser.add_argument('--fast_candidates', type=int, default=32)
    parser.add_argument('--fast_keep', type=int, default=16)
    parser.add_argument('--fast_distill_steps', type=int, default=500)
    parser.add_argument('--fast_distill_batch', type=int, default=32768)
    parser.add_argument('--fast_cull', type=str, default=None,
                        choices=['auto'],
                        help='auto: frame-global empty-ray culling — render '
                             'only proxy-occupied rays, budget sized from '
                             'the previous frame (renders the whole frame '
                             'as one program; --chunk is ignored)')
    parser.add_argument('--fast_cull_margin', type=float, default=1.2)
    parser.add_argument('--fast_placement', type=str, default='mid',
                        choices=['edges', 'mid'],
                        help="pdf sample placement (see eval.py)")
    parser.add_argument('--fast_quadrature', type=str, default='delta',
                        choices=['delta', 'ratio'],
                        help="fast-path alpha integration: 'delta' = "
                             "consecutive-difference deltas; 'ratio' = "
                             "proxy-shaped stratum quadrature (requires "
                             "fast_placement=mid) — exact at any K when "
                             "the field matches the placement CDF's "
                             "implied density (render/fast.py docstring)")
    parser.add_argument('--fast_opacity_eps', type=str, default='auto',
                        help="auto-cull PROXY-opacity foreground threshold: "
                             "a float, or 'auto' (default) to self-calibrate "
                             "per frame from rendered-empty rays (the proxy "
                             "overpredicts; see eval.py)")
    parser.add_argument('--fast_prepass', type=int, default=16,
                        help="prepass candidates/ray for auto-cull ranking")
    return parser.parse_args(args)


def main(hparams):
    import jax

    from nerf_siren_tpu.config import RenderConfig, TrainConfig
    from nerf_siren_tpu.datasets import dataset_dict
    from nerf_siren_tpu.training.checkpoints import load_ckpt
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem
    from nerf_siren_tpu.training.metrics import psnr as psnr_fn
    import jax.numpy as jnp

    w, h = hparams.img_wh
    kwargs = dict(root_dir=hparams.root_dir, split=hparams.split,
                  img_wh=tuple(hparams.img_wh))
    if hparams.dataset_name.startswith('llff'):
        kwargs['spheric_poses'] = hparams.spheric_poses
    dataset = dataset_dict[hparams.dataset_name](**kwargs)

    from nerf_siren_tpu.render.triplane import RenderingOptions, TriPlaneConfig
    tri_cfg = TriPlaneConfig(
        z_dim=hparams.eg3d_z_dim, w_dim=hparams.eg3d_z_dim,
        plane_resolution=hparams.eg3d_plane_res,
        channel_base=hparams.eg3d_channel_base,
        channel_max=hparams.eg3d_channel_max,
        rendering=RenderingOptions(
            depth_resolution=hparams.N_samples,
            depth_resolution_importance=max(hparams.N_importance, 1),
            ray_start=hparams.eg3d_ray_start, ray_end=hparams.eg3d_ray_end,
            box_warp=hparams.eg3d_box_warp,
            white_back=dataset.white_back))
    from nerf_siren_tpu.parallel.mesh import make_mesh
    devices = jax.devices()
    if hparams.num_chips > 0:
        devices = devices[:hparams.num_chips]
    system = EG3DSystem(RenderConfig(), TrainConfig(), steps_per_epoch=1,
                        triplane_cfg=tri_cfg, mesh=make_mesh(devices=devices),
                        plane_sampler=hparams.plane_sampler)
    params = system.init_params(jax.random.PRNGKey(0))
    params['eg3d_renderer'] = load_ckpt(params['eg3d_renderer'],
                                        hparams.ckpt_path, 'eg3d_renderer')
    # upload once: host-resident params would re-transfer the whole
    # generator to the device on every render() call
    params = jax.device_put(params)

    out_dir = os.path.join('results', hparams.dataset_name, hparams.scene_name)
    os.makedirs(out_dir, exist_ok=True)

    if hparams.renderer == 'fast':
        from nerf_siren_tpu.render.triplane_fast import make_fast_eg3d_renderer
        print('distilling density proxy ...', flush=True)
        fast_render = make_fast_eg3d_renderer(
            params['eg3d_renderer'], tri_cfg,
            n_candidates=hparams.fast_candidates, n_keep=hparams.fast_keep,
            distill_steps=hparams.fast_distill_steps,
            distill_batch=hparams.fast_distill_batch,
            cull=hparams.fast_cull, cull_margin=hparams.fast_cull_margin,
            opacity_eps=(hparams.fast_opacity_eps
                         if hparams.fast_opacity_eps == 'auto'
                         else float(hparams.fast_opacity_eps)),
            prepass_candidates=hparams.fast_prepass,
            placement=hparams.fast_placement,
            quadrature=hparams.fast_quadrature,
            rng=jax.random.PRNGKey(7))

        if hparams.fast_cull == 'auto':
            def render(params, rays):
                # frame-global: the culling budget ranks the whole frame
                return {k: np.asarray(v)
                        for k, v in fast_render(jnp.asarray(rays)).items()}
        else:
            def render(params, rays):
                # equal-size chunks so the jitted renderer traces once
                n = rays.shape[0]
                chunk = min(hparams.chunk, n)
                n_tiles = -(-n // chunk)
                padded = np.pad(rays, ((0, n_tiles * chunk - n), (0, 0)))
                outs = [fast_render(jnp.asarray(padded[j * chunk:(j + 1) * chunk]))
                        for j in range(n_tiles)]
                return {k: np.concatenate([np.asarray(o[k]) for o in outs])[:n]
                        for k in outs[0]}
    elif system.mesh.shape['data'] > 1:
        def render(params, rays):
            return system.render_sharded(params, rays, chunk=hparams.chunk)
    else:
        def render(params, rays):
            return system.render(params, rays, chunk=hparams.chunk)

    imgs, psnrs = [], []
    for i in range(len(dataset)):
        sample = dataset[i]
        out = render(params, np.asarray(sample['rays']))
        pred = np.asarray(out['rgb_fine'], np.float32).reshape(h, w, 3)
        img = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
        imgs.append(img)
        imageio.imwrite(os.path.join(out_dir, f'{i:03d}.png'), img)
        if 'rgbs' in sample:
            gt = sample['rgbs'].reshape(h, w, 3)
            psnrs.append(float(psnr_fn(jnp.asarray(pred), jnp.asarray(gt))))
        print(f'rendered {i + 1}/{len(dataset)}', flush=True)

    imageio.mimsave(os.path.join(out_dir, f'{hparams.scene_name}.gif'),
                    imgs, duration=1000 / 30)
    if psnrs:
        print(f'Mean PSNR: {np.mean(psnrs):.2f}')
    return np.mean(psnrs) if psnrs else None


if __name__ == '__main__':
    main(get_opts())
