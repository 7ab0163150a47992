"""EG3D training system (reference: system.py:17-169 EG3DSystem).

Single-scene overfit: the only latent is the renderer's learnable z; the
StyleGAN2 discriminator is unused (as in the reference). Rays come from the
datasets; forward maps them through mapping → synthesis → triplane
importance rendering; loss is MSE on coarse+fine rgb; validation renders in
4096-ray chunks (reference system.py:137-144).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from nerf_siren_tpu.config import RenderConfig, TrainConfig
from nerf_siren_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from nerf_siren_tpu.models.stylegan2 import w_avg_ema
from nerf_siren_tpu.render.triplane import (
    TriPlaneConfig,
    eg3d_render,
    importance_render,
    init_eg3d_renderer,
    pack_planes_for_sampling,
    triplane_mapping,
    triplane_mapping_pre_broadcast,
    triplane_planes,
)
from nerf_siren_tpu.training.losses import mse_loss
from nerf_siren_tpu.training.metrics import psnr
from nerf_siren_tpu.training.optimizers import get_optimizer, make_lr_schedule
from nerf_siren_tpu.training.system import TrainState

EG3D_VAL_CHUNK = 4096  # reference system.py:137


class EG3DSystem:
    def __init__(
        self,
        render_cfg: RenderConfig = RenderConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        steps_per_epoch: int = 1000,
        mesh: Optional[Mesh] = None,
        triplane_cfg: Optional[TriPlaneConfig] = None,
        plane_sampler: str = "gather",
    ):
        self.render_cfg = render_cfg
        self.train_cfg = train_cfg
        self.cfg = triplane_cfg if triplane_cfg is not None else TriPlaneConfig()
        self.steps_per_epoch = steps_per_epoch
        # 'gather' = jnp bf16 block-gather table; 'kernel' = the Pallas
        # triplane tile-gather sampler (ops/pallas/triplane_gather.py) —
        # eval-only (no VJP), measured in docs/triplane_gather_bench.json
        self.plane_sampler = plane_sampler
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = get_optimizer(train_cfg, steps_per_epoch)
        self.lr_schedule = make_lr_schedule(train_cfg, steps_per_epoch)
        self._train_step = None
        self._train_scan = None
        self._train_scan_batches = None
        self._train_scan_importance = None
        self._render_fn = None
        self._render_sharded_fn = None

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        # nested under the reference's checkpoint name (eg3d_renderer.*)
        return {"eg3d_renderer": init_eg3d_renderer(rng, self.cfg)}

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.init_params(rng)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=self.tx.init(params))
        return replicate(state, self.mesh)

    def _make_pure_step(self, with_ray_errors: bool = False):
        cfg, tx = self.cfg, self.tx

        def train_step(state: TrainState, rays, rgbs, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def compute_loss(params):
                out = eg3d_render(params["eg3d_renderer"], cfg,
                                  rays[:, 0:3], rays[:, 3:6],
                                  noise_mode="const", rng=step_rng)
                losses = mse_loss(out, rgbs)
                return losses["sum"], out

            grads, out = jax.grad(compute_loss, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

            # w_avg EMA update (reference networks_stylegan2.py:251-254):
            # truncation at eval time reads this buffer; without the update it
            # stays the zero init and truncation_psi<1 silently truncates
            # toward the origin. Computed from this step's mapping output.
            renderer = state.params["eg3d_renderer"]
            w_pre = triplane_mapping_pre_broadcast(renderer, cfg, renderer["z"])
            mapping_params = params["eg3d_renderer"]["backbone"]["mapping"]
            mapping_params["w_avg"] = w_avg_ema(
                mapping_params, cfg.backbone.mapping, w_pre)
            metrics = {
                "train/loss": jnp.mean((out["rgb_fine"] - rgbs) ** 2)
                + jnp.mean((out["rgb_coarse"] - rgbs) ** 2),
                "train/psnr": psnr(jax.lax.stop_gradient(out["rgb_fine"]), rgbs),
            }
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state)
            if with_ray_errors:
                err = jnp.mean(
                    (jax.lax.stop_gradient(out["rgb_fine"]) - rgbs) ** 2,
                    axis=-1)
                return new_state, metrics, err
            return new_state, metrics

        return train_step

    def _make_train_step(self):
        return functools.partial(jax.jit, donate_argnums=(0,))(
            self._make_pure_step())

    def train_step(self, state, batch: Dict[str, np.ndarray], rng):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        sharded = shard_rays({"rays": jnp.asarray(batch["rays"]),
                              "rgbs": jnp.asarray(batch["rgbs"])}, self.mesh)
        return self._train_step(state, sharded["rays"], sharded["rgbs"], rng)

    def train_scan(self, state, pool_rays, pool_rgbs, rng: jax.Array,
                   n_steps: int, batch_size: Optional[int] = None):
        """Run n_steps of EG3D training in ONE device program (lax.scan).

        Same rationale and semantics as NeRFSystem.train_scan (system.py):
        batches sample uniformly from the device-resident ray pool each
        step; use when per-dispatch latency matters (tunneled runtimes add
        O(100 ms) per host->device call vs the ~56 ms reference-config
        step). Returns (state, metrics-of-last-step)."""
        bs = batch_size or self.train_cfg.batch_size
        if self._train_scan is None:
            pure = self._make_pure_step()

            @functools.partial(jax.jit, donate_argnums=(0,),
                               static_argnames=("n_steps", "bs"))
            def scan_fn(state, rays, rgbs, rng, n_steps, bs):
                def body(st, key):
                    idx = jax.random.randint(key, (bs,), 0, rays.shape[0])
                    return pure(st, rays[idx], rgbs[idx],
                                jax.random.fold_in(key, 1))

                keys = jax.random.split(rng, n_steps)
                state, ms = jax.lax.scan(body, state, keys)
                return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

            self._train_scan = scan_fn
        return self._train_scan(state, jnp.asarray(pool_rays),
                                jnp.asarray(pool_rgbs), rng, n_steps, bs)

    def train_scan_importance(self, state, pool_rays, pool_rgbs,
                              rng: jax.Array, n_steps: int,
                              batch_size: Optional[int] = None,
                              alpha: float = 1.0, uniform_frac: float = 0.2):
        """Loss-guided ray sampling scan (see NeRFSystem.train_scan_importance)
        — particularly effective for the single-scene EG3D overfit, whose
        frames are mostly background the model converges on early."""
        from nerf_siren_tpu.training.system import make_scan_importance
        bs = batch_size or self.train_cfg.batch_size
        if self._train_scan_importance is None:
            self._train_scan_importance = make_scan_importance(
                self._make_pure_step(with_ray_errors=True))
        return self._train_scan_importance(state, jnp.asarray(pool_rays),
                                           jnp.asarray(pool_rgbs), rng,
                                           n_steps, bs, float(alpha),
                                           float(uniform_frac))

    def train_scan_batches(self, state, rays_b, rgbs_b, rng: jax.Array):
        """One device program over pre-batched (n_steps, batch, ...) data —
        epoch-exact semantics (see NeRFSystem.train_scan_batches)."""
        from nerf_siren_tpu.training.system import (make_scan_batches,
                                                    shard_batched)
        if self._train_scan_batches is None:
            self._train_scan_batches = make_scan_batches(
                self._make_pure_step())
        rays_b, rgbs_b = shard_batched(
            {"rays": jnp.asarray(rays_b), "rgbs": jnp.asarray(rgbs_b)},
            self.mesh)
        return self._train_scan_batches(state, rays_b, rgbs_b, rng)

    def render(self, params, rays: np.ndarray,
               chunk: int = EG3D_VAL_CHUNK) -> Dict[str, np.ndarray]:
        """Chunked deterministic render (reference system.py:137-144)."""
        cfg = self.cfg
        if self._render_fn is None:
            @jax.jit
            def render_fn(params, tiles):
                # synthesize the triplanes ONCE per frame — mapping +
                # StyleGAN synthesis dominate a per-tile call (reference
                # runs them per forward too, but its batched_inference
                # caches nothing; ~10x render speedup here)
                p = params["eg3d_renderer"]
                ws = triplane_mapping(p, cfg, p["z"])
                planes = triplane_planes(p, cfg, ws)
                # bf16 block-gather sampling table: 1.64x the gather rate
                # (the frame's dominant cost; ops/grid_sample.py). bf16
                # table rounding agrees with the f32 render at 82.5 dB
                # on a reference-config frame (measured on-chip) — far
                # above eval significance (tests/test_triplane.py)
                planes = pack_planes_for_sampling(planes, jnp.bfloat16)
                sampler = None
                if self.plane_sampler == "kernel":
                    from nerf_siren_tpu.render.triplane import (
                        make_kernel_plane_sampler)
                    sampler = make_kernel_plane_sampler(
                        planes, cfg.rendering.box_warp, tiles.shape[1])

                def tile(t):
                    (rgb_c, d_c, w_c, rgb_f, d_f, w_f) = importance_render(
                        planes, p["decoder"], t[None, :, 0:3], t[None, :, 3:6],
                        cfg.rendering, None, packed=True, sampler=sampler)
                    out = {"rgb_coarse": rgb_c, "depth_coarse": d_c,
                           "opacity_coarse": w_c, "rgb_fine": rgb_f,
                           "depth_fine": d_f, "opacity_fine": w_f}
                    return {k: v[0] for k, v in out.items()}

                return jax.lax.map(tile, tiles)
            self._render_fn = render_fn
        n = rays.shape[0]
        chunk = min(chunk, n)
        n_tiles = -(-n // chunk)
        pad = n_tiles * chunk - n
        tiles = np.pad(rays, ((0, pad), (0, 0))).reshape(n_tiles, chunk, -1)
        out = self._render_fn(params, jnp.asarray(tiles))
        return {k: np.asarray(v).reshape(n_tiles * chunk, *v.shape[2:])[:n]
                for k, v in out.items()}

    def render_sharded(self, params, rays: np.ndarray,
                       chunk: int = EG3D_VAL_CHUNK) -> Dict[str, np.ndarray]:
        """Multi-chip frame render: planes synthesized once and replicated,
        rays split over the mesh's data axis (zero collectives — see
        NeRFSystem.render_sharded). Falls back to render() on one device."""
        cfg = self.cfg
        n_dev = self.mesh.shape["data"]
        if n_dev == 1:
            return self.render(params, rays, chunk=chunk)
        if self._render_sharded_fn is None:
            from jax.sharding import PartitionSpec as P

            from nerf_siren_tpu.parallel.shard_train import shard_map_compat

            @functools.partial(jax.jit, static_argnames=("chunk_t",))
            def render_fn(params, rays, chunk_t):
                p = params["eg3d_renderer"]
                ws = triplane_mapping(p, cfg, p["z"])
                planes = triplane_planes(p, cfg, ws)
                planes = pack_planes_for_sampling(planes, jnp.bfloat16)

                def per_shard(planes, decoder, rays):
                    n = rays.shape[0]
                    ct = min(chunk_t, n)
                    nt = -(-n // ct)
                    tiles = jnp.pad(rays, ((0, nt * ct - n), (0, 0)))
                    tiles = tiles.reshape(nt, ct, rays.shape[1])

                    def tile(t):
                        (rgb_c, d_c, w_c, rgb_f, d_f, w_f) = importance_render(
                            planes, decoder, t[None, :, 0:3], t[None, :, 3:6],
                            cfg.rendering, None, packed=True)
                        out = {"rgb_coarse": rgb_c, "depth_coarse": d_c,
                               "opacity_coarse": w_c, "rgb_fine": rgb_f,
                               "depth_fine": d_f, "opacity_fine": w_f}
                        return {k: v[0] for k, v in out.items()}

                    out = jax.lax.map(tile, tiles)
                    return {k: v.reshape(nt * ct, *v.shape[2:])[:n]
                            for k, v in out.items()}

                return shard_map_compat(per_shard, mesh=self.mesh,
                                        in_specs=(P(), P(), P("data")),
                                        out_specs=P("data"))(
                    planes, p["decoder"], rays)

            self._render_sharded_fn = render_fn
        n = rays.shape[0]
        pad = -n % n_dev
        rays_p = shard_rays(
            jnp.asarray(np.pad(np.asarray(rays, np.float32),
                               ((0, pad), (0, 0)))), self.mesh)
        out = self._render_sharded_fn(params, rays_p, chunk)
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def current_lr(self, state) -> float:
        return float(self.lr_schedule(int(state.step)))
