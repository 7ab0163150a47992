"""Training systems — the TPU-native analogue of the reference's Lightning
modules (reference: system.py:172-306 NeRFSystem and friends).

A system owns: model configs, param init, the jitted train/eval steps, and the
sharding layout. It is deliberately NOT a module/trainer framework: state is an
explicit `TrainState` pytree threaded through pure steps, so the whole update
(forward, loss, backward, psum over the mesh, optimizer) is one compiled XLA
program per step.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.models.nerf import init_nerf
from nerf_siren_tpu.parallel.mesh import data_sharding, make_mesh, replicate, shard_rays
from nerf_siren_tpu.render.rendering import render_rays, render_rays_chunked
from nerf_siren_tpu.training.losses import loss_dict
from nerf_siren_tpu.training.metrics import psnr
from nerf_siren_tpu.training.optimizers import get_optimizer, make_lr_schedule


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


class NeRFSystem:
    """Vanilla (and semantic-ready) NeRF trainer.

    Parity with reference system.py:172-306: two embeddings (10/4 freqs),
    coarse (+fine) NeRF, MSE loss, PSNR logging; plus the TPU data-parallel
    layout of SURVEY §2.5 (rays sharded, params replicated).
    """

    def __init__(
        self,
        render_cfg: RenderConfig = RenderConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        nerf_cfg: NeRFConfig = NeRFConfig(),
        steps_per_epoch: int = 1000,
        mesh: Optional[Mesh] = None,
        field_type: str = "mlp",           # 'mlp' | 'siren'
        siren_hidden: int = 256,
        siren_layers: int = 8,
        siren_z_dim: int = 100,
        siren_box_warp: float = 51.0,  # UniformBoxWarp sidelength: scene box
        # extent mapped to [-1,1]; reference hardcodes 51 (Replica rooms,
        # reference nerf.py:134-140) — size it to the scene or the sin trunk
        # sees near-zero inputs (models/siren.py docstring has the measurement)
        train_backend: str = "jnp",  # 'jnp' | 'fused' | 'culled' | 'culled_fused'
        culled_candidates: int = 32,
        culled_sel: int = 16,
        culled_uni: int = 8,
        proxy_lambda: float = 1.0,
    ):
        self.render_cfg = render_cfg
        self.train_cfg = train_cfg
        self.nerf_cfg = nerf_cfg
        self.steps_per_epoch = steps_per_epoch
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = get_optimizer(train_cfg, steps_per_epoch)
        self.lr_schedule = make_lr_schedule(train_cfg, steps_per_epoch)
        self.loss_fn = loss_dict[train_cfg.loss_type]
        self.field_type = field_type
        self.siren_hidden = siren_hidden
        self.siren_layers = siren_layers
        self.siren_z_dim = siren_z_dim
        self.siren_box_warp = siren_box_warp
        # 'fused': train through the VMEM-resident Pallas fwd+bwd kernels
        # (ops/pallas/fused_mlp_train.py) — bf16 mixed precision, ~3x the
        # field fwd+bwd (measured on-chip); eval/render keeps the jnp path.
        # Restricted to the reference topology the kernel implements.
        # 'culled': proxy-culled training (render/culled_train.py) — an
        # online-distilled proxy places culled_sel samples/ray, culled_uni
        # stratified-uniform samples stay as the exploration floor, both
        # networks evaluate only the merged K depths. 'culled_fused'
        # additionally runs those evaluations through the fused Pallas
        # training kernels. Opt-in accelerators; convergence parity vs the
        # reference recipe is measured by tools/fused_train_parity.py.
        if train_backend in ("fused", "culled_fused"):
            assert field_type == "mlp" and nerf_cfg.width == 256 \
                and nerf_cfg.depth == 8 and nerf_cfg.skips == (4,) \
                and nerf_cfg.n_classes == 0, (
                    "fused train backends support the reference 8x256 "
                    "skip-(4,) topology without a semantic head")
        if train_backend in ("culled", "culled_fused"):
            assert render_cfg.n_importance > 0 and field_type == "mlp", (
                "culled training needs a fine network and the MLP field")
        self.train_backend = train_backend
        self.culled_candidates = culled_candidates
        self.culled_sel = culled_sel
        self.culled_uni = culled_uni
        self.proxy_lambda = proxy_lambda
        self._train_step = None
        self._train_scan = None
        self._train_scan_batches = None
        self._train_scan_importance = None
        self._train_accum = None
        self._render_fn = None
        self._render_sharded_fn = None

    def _field_fn(self, rays=None):
        """Field override; None selects the default MLP field."""
        if self.field_type == "siren":
            from nerf_siren_tpu.models.siren import siren_field_fn
            return functools.partial(siren_field_fn,
                                     hidden_dim=self.siren_hidden,
                                     box_sidelength=self.siren_box_warp)
        return None

    # -- state ----------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        k_coarse, k_fine = jax.random.split(rng)
        if self.field_type == "siren":
            from nerf_siren_tpu.models.siren import init_siren_nerf
            make = lambda k: init_siren_nerf(
                k, self.siren_hidden, self.siren_layers, self.siren_z_dim,
                n_classes=self.nerf_cfg.n_classes)
        else:
            make = lambda k: init_nerf(k, self.nerf_cfg)
        params = {"coarse": make(k_coarse)}
        if self.render_cfg.n_importance > 0:
            params["fine"] = make(k_fine)
        if self.train_backend in ("culled", "culled_fused"):
            # online-trained placement proxy (render/culled_train.py); saved
            # in checkpoints under the 'proxy' prefix, where eval.py's fast
            # renderer can reuse it instead of re-distilling
            from nerf_siren_tpu.render.fast import init_proxy
            params["proxy"] = init_proxy(jax.random.fold_in(rng, 2),
                                         hidden=64)
        return params

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.init_params(rng)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )
        return replicate(state, self.mesh)

    # -- steps ----------------------------------------------------------------

    def _make_pure_step(self, with_ray_errors: bool = False):
        render_cfg = self.render_cfg.replace(test_time=False)
        nerf_cfg = self.nerf_cfg
        tx, loss_fn = self.tx, self.loss_fn
        if self.train_backend in ("fused", "culled_fused"):
            from nerf_siren_tpu.ops.pallas.fused_mlp_train import (
                make_fused_train_field_fn)

            def field_fn_for(rays):
                return make_fused_train_field_fn(rays[:, 3:6])
        else:
            field_fn_for = self._field_fn

        culled = self.train_backend in ("culled", "culled_fused")
        culled_kw = dict(n_candidates=self.culled_candidates,
                         n_sel=self.culled_sel, n_uni=self.culled_uni)
        proxy_lambda = self.proxy_lambda

        def train_step(state: TrainState, rays: jax.Array, rgbs: jax.Array,
                       rng: jax.Array, cls_target: Optional[jax.Array] = None):
            step_rng = jax.random.fold_in(rng, state.step)

            def compute_loss(params):
                if culled:
                    from nerf_siren_tpu.render.culled_train import (
                        render_rays_culled)
                    out, p_loss = render_rays_culled(
                        params, rays, render_cfg, step_rng,
                        nerf_cfg=nerf_cfg, field_fn=field_fn_for(rays),
                        **culled_kw)
                    losses = loss_fn(out, rgbs, cls_target=cls_target)
                    losses = dict(losses, proxy=p_loss,
                                  sum=losses["sum"] + proxy_lambda * p_loss)
                    return losses["sum"], (losses, out)
                out = render_rays(params, rays, render_cfg, step_rng,
                                  nerf_cfg=nerf_cfg, field_fn=field_fn_for(rays))
                losses = loss_fn(out, rgbs, cls_target=cls_target)
                return losses["sum"], (losses, out)

            grads, (losses, out) = jax.grad(compute_loss, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

            rgb_key = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
            metrics = {f"train/{k}_loss" if k != "sum" else "train/loss": v
                       for k, v in losses.items()}
            metrics["train/psnr"] = psnr(jax.lax.stop_gradient(out[rgb_key]), rgbs)
            new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
            if with_ray_errors:
                err = jnp.mean(
                    (jax.lax.stop_gradient(out[rgb_key]) - rgbs) ** 2, axis=-1)
                return new_state, metrics, err
            return new_state, metrics

        return train_step

    def _make_train_step(self):
        return functools.partial(jax.jit, donate_argnums=(0,))(
            self._make_pure_step())

    def train_scan(self, state: TrainState, pool_rays, pool_rgbs,
                   rng: jax.Array, n_steps: int,
                   batch_size: Optional[int] = None):
        """Run n_steps of training in ONE device program (lax.scan).

        Batches are sampled uniformly from the device-resident ray pool each
        step. Use when per-dispatch latency matters (remote/tunneled TPU
        runtimes add O(100 ms) per host->device call, which dwarfs a ~50 ms
        step); semantics match n_steps calls of train_step modulo the batch
        sampling RNG. Returns (state, metrics-of-last-step)."""
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

    def train_step_accum(self, state: TrainState, batch: Dict[str, np.ndarray],
                         rng: jax.Array, n_micro: int):
        """One optimizer update from `n_micro` sequential micro-batches.

        Trains effective batches larger than memory allows (the whole
        (rays × samples) activation slab never exceeds one micro-batch):
        gradients are averaged across micro-batches inside a lax.scan,
        then applied once. The batch's leading dim must divide by n_micro.
        Loss/psnr metrics are micro-batch means."""
        if self.train_backend in ("culled", "culled_fused"):
            raise NotImplementedError(
                "train_step_accum supports the jnp/fused backends; use "
                "train_step or train_scan with the culled backends")
        if self._train_accum is None:
            render_cfg = self.render_cfg.replace(test_time=False)
            nerf_cfg, tx, loss_fn = self.nerf_cfg, self.tx, self.loss_fn
            field_fn_for = self._field_fn
            if self.train_backend == "fused":
                from nerf_siren_tpu.ops.pallas.fused_mlp_train import (
                    make_fused_train_field_fn)

                def field_fn_for(rays):
                    return make_fused_train_field_fn(rays[:, 3:6])

            @functools.partial(jax.jit, donate_argnums=(0,),
                               static_argnames=("n_micro",))
            def step(state, rays_m, rgbs_m, rng, n_micro):
                step_rng = jax.random.fold_in(rng, state.step)

                def micro(carry, xs):
                    grads_acc, loss_acc, psnr_acc = carry
                    r, c = xs

                    def compute_loss(params):
                        out = render_rays(params, r, render_cfg, step_rng,
                                          nerf_cfg=nerf_cfg,
                                          field_fn=field_fn_for(r))
                        rgb_key = ("rgb_fine" if "rgb_fine" in out
                                   else "rgb_coarse")
                        return loss_fn(out, c)["sum"], out[rgb_key]

                    (loss, pred), grads = jax.value_and_grad(
                        compute_loss, has_aux=True)(state.params)
                    grads_acc = jax.tree_util.tree_map(
                        lambda a, g: a + g / n_micro, grads_acc, grads)
                    return (grads_acc, loss_acc + loss / n_micro,
                            psnr_acc + psnr(pred, c) / n_micro), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                (grads, loss, mpsnr), _ = jax.lax.scan(
                    micro, (zeros, jnp.zeros(()), jnp.zeros(())),
                    (rays_m, rgbs_m))
                updates, opt_state = tx.update(grads, state.opt_state,
                                               state.params)
                params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                state.params, updates)
                metrics = {"train/loss": loss, "train/psnr": mpsnr}
                return TrainState(step=state.step + 1, params=params,
                                  opt_state=opt_state), metrics

            self._train_accum = step
        # micro-batch on the host, then place with the batch dim (axis 1)
        # split across devices — each device sees its slice of every
        # micro-batch (same layout train_step's shard_rays would give it)
        rays = np.asarray(batch["rays"])
        rgbs = np.asarray(batch["rgbs"])
        assert rays.shape[0] % n_micro == 0, "batch must divide by n_micro"
        rays_m, rgbs_m = shard_batched(
            {"rays": jnp.asarray(rays.reshape(n_micro, -1, rays.shape[-1])),
             "rgbs": jnp.asarray(rgbs.reshape(n_micro, -1, rgbs.shape[-1]))},
            self.mesh)
        return self._train_accum(state, rays_m, rgbs_m, rng, n_micro)

    def train_scan_importance(self, state: TrainState, pool_rays, pool_rgbs,
                              rng: jax.Array, n_steps: int,
                              batch_size: Optional[int] = None,
                              alpha: float = 1.0,
                              uniform_frac: float = 0.2):
        """train_scan with LOSS-GUIDED ray sampling (one device program).

        A device-resident per-ray error buffer (init: uniform) drives batch
        selection: rays are drawn with probability ∝ (running error)^alpha,
        mixed with a `uniform_frac` uniform floor so stale/zero-error rays
        keep getting revisited; each step writes its batch's fresh per-ray
        errors back. Spends compute on the rays the model still gets wrong
        (hard surfaces, speculars) instead of converged background — the
        standard efficient-ray-sampling idea, device-side so the whole loop
        stays one compiled program. Opt-in accelerator: convergence
        semantics differ from the reference's uniform epochs (which
        train_step / train_scan_batches preserve).

        Returns (state, metrics-of-last-step)."""
        bs = batch_size or self.train_cfg.batch_size
        if self._train_scan_importance is None:
            self._train_scan_importance = make_scan_importance(
                self._make_pure_step(with_ray_errors=True))
        return self._train_scan_importance(state, jnp.asarray(pool_rays),
                                           jnp.asarray(pool_rgbs), rng,
                                           n_steps, bs, float(alpha),
                                           float(uniform_frac))

    def train_scan_batches(self, state: TrainState, rays_b, rgbs_b,
                           rng: jax.Array):
        """Run a GROUP of pre-batched steps in ONE device program.

        rays_b/rgbs_b: (n_steps, batch, ...) — exactly the batches the epoch
        iterator would feed successive train_step calls, so semantics match
        them (train.py passes the same rng every call and the pure step
        folds in state.step; tested to adam-noise tolerance). Unlike
        train_scan (uniform pool sampling), this preserves the reference's
        epoch semantics while collapsing n_steps dispatches into one
        (--steps_per_dispatch in train.py). Measured on-chip: neutral when
        the async host loop already pipelines dispatches (20.1 vs 21.8
        ms/step at the reference recipe); wins when it cannot (per-step
        metric fetches, slow hosts, high-latency tunnels). Returns
        (state, metrics-of-last-step)."""
        if self._train_scan_batches is None:
            self._train_scan_batches = make_scan_batches(
                self._make_pure_step())
        rays_b, rgbs_b = shard_batched(
            {"rays": jnp.asarray(rays_b), "rgbs": jnp.asarray(rgbs_b)},
            self.mesh)
        return self._train_scan_batches(state, rays_b, rgbs_b, rng)

    def train_step(self, state: TrainState, batch: Dict[str, np.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if self._train_step is None:
            self._train_step = self._make_train_step()
        sharded = shard_rays(
            {"rays": jnp.asarray(batch["rays"]), "rgbs": jnp.asarray(batch["rgbs"])},
            self.mesh,
        )
        cls_t = batch.get("cls")
        if cls_t is not None:
            cls_t = shard_rays(jnp.asarray(cls_t), self.mesh)
        return self._train_step(state, sharded["rays"], sharded["rgbs"], rng, cls_t)

    # -- inference ------------------------------------------------------------

    def render(self, params, rays: np.ndarray, test_time: bool = False,
               rng: Optional[jax.Array] = None) -> Dict[str, np.ndarray]:
        """Chunked full-image render (val/eval path). Deterministic by default:
        perturb=0, noise=0 (reference eval.py uses the same settings)."""
        cfg = self.render_cfg.replace(test_time=test_time, perturb=0.0, noise_std=0.0)
        if self._render_fn is None:
            field_fn_for = self._field_fn

            @functools.partial(jax.jit, static_argnames=("cfg",))
            def render_fn(params, rays, cfg):
                return render_rays_chunked(params, rays, cfg, None,
                                           nerf_cfg=self.nerf_cfg,
                                           field_fn=field_fn_for(rays))
            self._render_fn = render_fn
        out = self._render_fn(params, jnp.asarray(rays), cfg)
        return {k: np.asarray(v) for k, v in out.items()}

    def render_sharded(self, params, rays: np.ndarray, test_time: bool = False
                       ) -> Dict[str, np.ndarray]:
        """Multi-chip full-image render: rays split over the mesh's data
        axis, each device runs the chunked renderer on its slice (params
        replicated, ZERO collectives — eval rays are embarrassingly
        parallel, so N chips render a frame ~N× faster over ICI-free
        execution). Pads to a device multiple and slices back. Asserted
        equal to render() on the virtual 8-device mesh in tests."""
        cfg = self.render_cfg.replace(test_time=test_time, perturb=0.0,
                                      noise_std=0.0)
        n_dev = self.mesh.shape["data"]
        if n_dev == 1:
            return self.render(params, rays, test_time=test_time)
        if self._render_sharded_fn is None:
            from jax.sharding import PartitionSpec as P

            from nerf_siren_tpu.parallel.shard_train import shard_map_compat

            field_fn_for = self._field_fn
            nerf_cfg = self.nerf_cfg

            @functools.partial(jax.jit, static_argnames=("cfg",))
            def render_fn(params, rays, cfg):
                def per_shard(params, rays):
                    return render_rays_chunked(params, rays, cfg, None,
                                               nerf_cfg=nerf_cfg,
                                               field_fn=field_fn_for(rays))

                return shard_map_compat(
                    functools.partial(per_shard),
                    mesh=self.mesh,
                    in_specs=(P(), P("data")),
                    out_specs=P("data"))(params, rays)

            self._render_sharded_fn = render_fn
        n = rays.shape[0]
        pad = -n % n_dev
        rays_p = np.pad(np.asarray(rays, np.float32), ((0, pad), (0, 0)))
        from nerf_siren_tpu.parallel.mesh import shard_rays as _shard
        rays_p = _shard(jnp.asarray(rays_p), self.mesh)
        out = self._render_sharded_fn(params, rays_p, cfg)
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def current_lr(self, state: TrainState) -> float:
        return float(self.lr_schedule(int(state.step)))


def make_scan_importance(pure_err_step):
    """jit a loss-guided-sampling lax.scan (see train_scan_importance).

    `pure_err_step` is (state, rays, rgbs, rng) -> (state, metrics,
    per-ray-error); shared by NeRFSystem and EG3DSystem."""

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("n_steps", "bs", "alpha",
                                        "uniform_frac"))
    def scan_fn(state, rays, rgbs, rng, n_steps, bs, alpha, uniform_frac):
        n = rays.shape[0]

        def body(carry, key):
            st, buf = carry
            k_cat, k_uni, k_mix, k_step = jax.random.split(key, 4)
            logits = alpha * jnp.log(buf + 1e-8)
            idx_imp = jax.random.categorical(k_cat, logits, shape=(bs,))
            idx_uni = jax.random.randint(k_uni, (bs,), 0, n)
            take_uni = jax.random.uniform(k_mix, (bs,)) < uniform_frac
            idx = jnp.where(take_uni, idx_uni, idx_imp)
            st, ms, err = pure_err_step(st, rays[idx], rgbs[idx], k_step)
            return (st, buf.at[idx].set(err)), ms

        buf0 = jnp.ones((n,), jnp.float32)
        keys = jax.random.split(rng, n_steps)
        (state, _), ms = jax.lax.scan(body, (state, buf0), keys)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return scan_fn


def make_scan_batches(pure_step):
    """jit a lax.scan over pre-batched (n_steps, batch, ...) rays/rgbs.

    Shared by NeRFSystem/EG3DSystem.train_scan_batches; `pure_step` is a
    (state, rays, rgbs, rng) -> (state, metrics) pure training step."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_fn(state, rays_b, rgbs_b, rng):
        def body(st, xs):
            rays, rgbs = xs
            return pure_step(st, rays, rgbs, rng)

        state, ms = jax.lax.scan(body, state, (rays_b, rgbs_b))
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return scan_fn


def shard_batched(batch, mesh: Mesh, axis: str = "data"):
    """Place (n_steps, batch, ...) arrays with the BATCH dim (axis 1) split
    across devices — the scan carries per-step slices already sharded the
    way train_step's shard_rays lays out a single batch.

    Multi-process: each host passes its LOCAL rows (n_steps, local_bs, ...)
    and they become that host's addressable shards of the global batch —
    same contract as parallel.mesh.shard_rays (a plain device_put here
    would mistake the local rows for the full global array and build
    inconsistent replicas across hosts)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(None, axis))
    if jax.process_count() > 1:
        put = functools.partial(
            jax.make_array_from_process_local_data, sharding)
    else:
        put = functools.partial(jax.device_put, device=sharding)
    out = jax.tree_util.tree_map(put, batch)
    return tuple(out[k] for k in ("rays", "rgbs"))


def epoch_iterator(all_rays: np.ndarray, all_rgbs: np.ndarray, batch_size: int,
                   seed: int, epoch: int, extras: Optional[Dict[str, np.ndarray]] = None,
                   shard_index: int = 0, num_shards: int = 1):
    """Host-side shuffled batch iterator over the precomputed ray buffer —
    replaces the torch DataLoader (reference: system.py:237-247). Drops the
    ragged tail so every step has static shapes.

    Multi-host: `shard_index`/`num_shards` give each process a disjoint
    interleaved slice (the DistributedSampler role); every host draws
    batch_size/num_shards LOCAL rows per step, deterministically aligned so
    all hosts yield the same number of batches per epoch."""
    n = all_rays.shape[0]
    if num_shards > 1 and batch_size % num_shards != 0:
        raise ValueError(
            f"batch_size ({batch_size}) must divide evenly by the number of "
            f"data shards ({num_shards}) so every host feeds the same local "
            f"row count; pick a batch size that is a multiple of {num_shards}")
    local = np.arange(shard_index, n, num_shards)
    rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, shard_index]))
    perm = rng.permutation(local)
    local_bs = batch_size // num_shards
    n_batches = (n // num_shards) // local_bs
    for b in range(n_batches):
        idx = perm[b * local_bs:(b + 1) * local_bs]
        batch = {"rays": all_rays[idx], "rgbs": all_rgbs[idx]}
        if extras:
            for k, v in extras.items():
                batch[k] = v[idx]
        yield batch
