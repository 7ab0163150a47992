"""Semantic NeRF training system (reference: system.py:310-479 NeRF3DSystem /
NeRF3DSystem_ib).

Adds a PointNet dense-classification model over weight-sampled point clouds
(semantic_network='pointnet') or a dense voxel UNet (='conv3d', the TPU
replacement for the MinkowskiEngine sparse UNet — reference's ME path is
half-disabled, SURVEY §2.4) to the NeRF trainer, renders through
render_rays_3d, and trains with the msece/msenll losses against per-ray
class labels.

The '_ib' (image-batch) variant of the reference only changes batch shape
handling ((B, H·W, 8) → (B·H·W, 8), reference system.py:454-479); here
batches are flat ray arrays already, so one system covers both.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.models.pointnet import init_pointnet_dense_cls
from nerf_siren_tpu.parallel.mesh import replicate, shard_rays
from nerf_siren_tpu.render.rendering_3d import render_rays_3d
from nerf_siren_tpu.training.metrics import psnr
from nerf_siren_tpu.training.system import NeRFSystem, TrainState


class NeRF3DSystem(NeRFSystem):
    def __init__(
        self,
        render_cfg: RenderConfig = RenderConfig(),
        train_cfg: TrainConfig = TrainConfig(loss_type="msenll"),
        nerf_cfg: NeRFConfig = NeRFConfig(),
        steps_per_epoch: int = 1000,
        mesh: Optional[Mesh] = None,
        semantic_network: str = "pointnet",
        n_classes: int = 6,
        point_capacity: int = 8192,
        no_grad_on_nerf: bool = True,
        point_norm: str = "frob",
    ):
        super().__init__(render_cfg, train_cfg, nerf_cfg, steps_per_epoch, mesh)
        self.semantic_network = semantic_network
        self.n_classes = n_classes
        self.point_capacity = point_capacity
        self.no_grad_on_nerf = no_grad_on_nerf
        # 'rms' = count-invariant cloud normalization (see
        # render/rendering_3d.semantic_from_weights); 'frob' = reference
        self.point_norm = point_norm
        if semantic_network == "pointnet":
            from nerf_siren_tpu.models.pointnet import apply_pointnet_dense_cls
            self._points_apply = apply_pointnet_dense_cls
        elif semantic_network == "conv3d":
            from nerf_siren_tpu.models.voxel_unet import apply_voxel_unet_points
            self._points_apply = apply_voxel_unet_points
        else:
            raise NotImplementedError(semantic_network)

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        k_nerf, k_pts = jax.random.split(rng)
        params = super().init_params(k_nerf)
        if self.semantic_network == "pointnet":
            params["points"] = init_pointnet_dense_cls(k_pts, k=self.n_classes, inc=6)
        else:
            from nerf_siren_tpu.models.voxel_unet import init_voxel_unet
            params["points"] = init_voxel_unet(k_pts, in_channels=7,
                                               out_channels=self.n_classes)
        return params

    def _make_pure_step(self):
        render_cfg = self.render_cfg.replace(test_time=False)
        nerf_cfg = self.nerf_cfg
        tx, loss_fn = self.tx, self.loss_fn
        sem_kwargs = dict(
            n_classes=self.n_classes,
            point_capacity=self.point_capacity,
            no_grad_on_nerf=self.no_grad_on_nerf,
            points_apply=self._points_apply,
            point_norm=self.point_norm,
        )

        def train_step(state: TrainState, rays, rgbs, rng, cls_target):
            step_rng = jax.random.fold_in(rng, state.step)

            def compute_loss(params):
                out = render_rays_3d(params, rays, render_cfg, step_rng,
                                     nerf_cfg=nerf_cfg, **sem_kwargs)
                losses = loss_fn(out, rgbs, cls_target=cls_target)
                return losses["sum"], (losses, out)

            grads, (losses, out) = jax.grad(compute_loss, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

            rgb_key = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
            metrics = {
                "train/total_loss": losses["sum"],
                "train/rgb_loss": losses.get("rgb", losses["sum"]),
                "train/cls_loss": losses.get("cls", jnp.zeros(())),
                "train/psnr": psnr(jax.lax.stop_gradient(out[rgb_key]), rgbs),
            }
            new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
            return new_state, metrics

        return train_step

    def _make_train_step(self):
        return functools.partial(jax.jit, donate_argnums=(0,))(
            self._make_pure_step())

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        rays = np.asarray(batch["rays"]).reshape(-1, 8)
        rgbs = np.asarray(batch["rgbs"]).reshape(-1, 3)
        cls_t = np.asarray(batch["cls"]).reshape(-1)
        sharded = shard_rays(
            {"rays": jnp.asarray(rays), "rgbs": jnp.asarray(rgbs),
             "cls": jnp.asarray(cls_t)}, self.mesh)
        return self._train_step(state, sharded["rays"], sharded["rgbs"], rng,
                                sharded["cls"])

    def train_scan_batches(self, state, rays_b, rgbs_b, rng: jax.Array,
                           cls_b=None):
        """One device program over pre-batched (n_steps, batch, ...) data
        with per-step class targets (see NeRFSystem.train_scan_batches)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._train_scan_batches is None:
            pure = self._make_pure_step()

            @functools.partial(jax.jit, donate_argnums=(0,))
            def scan_fn(state, rays_b, rgbs_b, cls_b, rng):
                def body(st, xs):
                    rays, rgbs, cls_t = xs
                    return pure(st, rays, rgbs, rng, cls_t)

                state, ms = jax.lax.scan(body, state, (rays_b, rgbs_b, cls_b))
                return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

            self._train_scan_batches = scan_fn
        sharding = NamedSharding(self.mesh, P(None, "data"))
        n_steps = np.asarray(rays_b).shape[0]
        put = lambda x, shape: jax.device_put(
            jnp.asarray(np.asarray(x).reshape(shape)), sharding)
        rays_b = put(rays_b, (n_steps, -1, 8))
        rgbs_b = put(rgbs_b, (n_steps, -1, 3))
        cls_b = put(cls_b, (n_steps, -1))
        return self._train_scan_batches(state, rays_b, rgbs_b, cls_b, rng)

    def render(self, params, rays: np.ndarray, test_time: bool = False,
               rng=None) -> Dict[str, np.ndarray]:
        """Chunked semantic render (adds cls maps to the output dict)."""
        cfg = self.render_cfg.replace(test_time=test_time, perturb=0.0, noise_std=0.0)
        sem_kwargs = dict(n_classes=self.n_classes, point_norm=self.point_norm,
                          point_capacity=self.point_capacity,
                          no_grad_on_nerf=False, points_apply=self._points_apply)
        if self._render_fn is None:
            @functools.partial(jax.jit, static_argnames=("cfg",))
            def render_fn(params, rays, cfg):
                n = rays.shape[0]
                chunk = min(cfg.chunk, n)
                n_tiles = -(-n // chunk)
                pad = n_tiles * chunk - n
                tiles = jnp.pad(rays, ((0, pad), (0, 0))).reshape(n_tiles, chunk, 8)
                out = jax.lax.map(
                    lambda t: render_rays_3d(params, t, cfg, None,
                                             nerf_cfg=self.nerf_cfg, **sem_kwargs),
                    tiles)
                return {k: v.reshape(n_tiles * chunk, *v.shape[2:])[:n]
                        for k, v in out.items()}
            self._render_fn = render_fn
        out = self._render_fn(params, jnp.asarray(rays), cfg)
        return {k: np.asarray(v) for k, v in out.items()}

    def render_sharded(self, params, rays: np.ndarray, test_time: bool = False
                       ) -> Dict[str, np.ndarray]:
        """Multi-chip semantic render: rays split over the data mesh, params
        replicated, zero collectives (see NeRFSystem.render_sharded)."""
        cfg = self.render_cfg.replace(test_time=test_time, perturb=0.0,
                                      noise_std=0.0)
        n_dev = self.mesh.shape["data"]
        if n_dev == 1:
            return self.render(params, rays, test_time=test_time)
        if self._render_sharded_fn is None:
            from jax.sharding import PartitionSpec as P

            from nerf_siren_tpu.parallel.shard_train import shard_map_compat

            sem_kwargs = dict(n_classes=self.n_classes,
                              point_capacity=self.point_capacity,
                              no_grad_on_nerf=False,
                              point_norm=self.point_norm,
                              points_apply=self._points_apply)

            @functools.partial(jax.jit, static_argnames=("cfg",))
            def render_fn(params, rays, cfg):
                def per_shard(params, rays):
                    n = rays.shape[0]
                    chunk = min(cfg.chunk, n)
                    n_tiles = -(-n // chunk)
                    pad = n_tiles * chunk - n
                    tiles = jnp.pad(rays, ((0, pad), (0, 0))).reshape(
                        n_tiles, chunk, 8)
                    out = jax.lax.map(
                        lambda t: render_rays_3d(params, t, cfg, None,
                                                 nerf_cfg=self.nerf_cfg,
                                                 **sem_kwargs),
                        tiles)
                    return {k: v.reshape(n_tiles * chunk, *v.shape[2:])[:n]
                            for k, v in out.items()}

                return shard_map_compat(per_shard, mesh=self.mesh,
                                        in_specs=(P(), P("data")),
                                        out_specs=P("data"))(params, rays)

            self._render_sharded_fn = render_fn
        n = rays.shape[0]
        pad = -n % n_dev
        rays_p = shard_rays(
            jnp.asarray(np.pad(np.asarray(rays, np.float32),
                               ((0, pad), (0, 0)))), self.mesh)
        out = self._render_sharded_fn(params, rays_p, cfg)
        return {k: np.asarray(v)[:n] for k, v in out.items()}


# alias mirroring the reference class name (behavioral difference is only
# batch shape, which the flat-ray pipeline already absorbs)
NeRF3DSystem_ib = NeRF3DSystem
