"""Training CLI — the analogue of the reference driver (reference: train.py:13-68).

Builds the dataset, system and mesh, runs the epoch loop with per-epoch
validation (GT/pred/depth image triplet to TensorBoard, reference:
system.py:277-306), saves top-K checkpoints by val loss, and supports full
resume (--ckpt_path) and warm starts (--pretrained).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from opt import get_opts


def build_system(hparams, white_back: bool, steps_per_epoch: int, n_classes: int = 0):
    import jax.numpy as jnp

    from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
    from nerf_siren_tpu.parallel.mesh import make_mesh
    from nerf_siren_tpu.training.system import NeRFSystem

    render_cfg = RenderConfig(
        n_samples=hparams.N_samples,
        n_importance=hparams.N_importance,
        use_disp=hparams.use_disp,
        perturb=hparams.perturb,
        noise_std=hparams.noise_std,
        white_back=white_back,
        chunk=hparams.chunk,
    )
    train_cfg = TrainConfig(
        optimizer=hparams.optimizer,
        lr=hparams.lr,
        momentum=hparams.momentum,
        weight_decay=hparams.weight_decay,
        lr_scheduler=hparams.lr_scheduler,
        decay_step=tuple(hparams.decay_step),
        decay_gamma=hparams.decay_gamma,
        warmup_epochs=hparams.warmup_epochs,
        warmup_multiplier=hparams.warmup_multiplier,
        poly_exp=hparams.poly_exp,
        num_epochs=hparams.num_epochs,
        batch_size=hparams.batch_size,
        loss_type=hparams.loss_type,
        seed=hparams.seed,
    )
    field_classes = getattr(hparams, "n_classes", 0) or 0
    nerf_cfg = NeRFConfig(n_classes=field_classes)
    devices = jax.devices()
    if hparams.num_chips and hparams.num_chips < len(devices):
        devices = devices[: hparams.num_chips]
    mesh = make_mesh(devices=devices)

    if hparams.mode == "normal":
        system = NeRFSystem(render_cfg, train_cfg, nerf_cfg, steps_per_epoch, mesh,
                            field_type=getattr(hparams, "field", "mlp"),
                            siren_box_warp=getattr(hparams, "siren_box_warp", 51.0),
                            train_backend=getattr(hparams, "train_backend", "jnp"))
    elif hparams.mode in ("d3", "d3_ib"):
        from nerf_siren_tpu.training.semantic_system import NeRF3DSystem

        system = NeRF3DSystem(render_cfg, train_cfg, nerf_cfg, steps_per_epoch, mesh,
                              semantic_network=hparams.semantic_network,
                              point_norm=getattr(hparams, 'point_norm', 'frob'),
                              n_classes=n_classes or 6)
    elif hparams.mode == "eg3d":
        from nerf_siren_tpu.render.triplane import RenderingOptions, TriPlaneConfig
        from nerf_siren_tpu.training.eg3d_system import EG3DSystem

        tri_cfg = TriPlaneConfig(
            z_dim=hparams.eg3d_z_dim, w_dim=hparams.eg3d_z_dim,
            plane_resolution=hparams.eg3d_plane_res,
            channel_base=hparams.eg3d_channel_base,
            channel_max=hparams.eg3d_channel_max,
            rendering=RenderingOptions(
                depth_resolution=hparams.N_samples,
                depth_resolution_importance=max(hparams.N_importance, 1),
                ray_start=hparams.eg3d_ray_start,
                ray_end=hparams.eg3d_ray_end,
                box_warp=hparams.eg3d_box_warp,
                white_back=white_back))
        system = EG3DSystem(render_cfg, train_cfg, steps_per_epoch, mesh,
                            triplane_cfg=tri_cfg)
    else:
        raise ValueError(f"unknown mode {hparams.mode!r}")
    return system


def validate(system, state, val_ds, writer, step: int, img_wh,
             max_images: int = 1, exp_name: str = "exp"):
    from nerf_siren_tpu.training.metrics import psnr as psnr_fn
    from nerf_siren_tpu.utils.visualization import visualize_depth

    w, h = img_wh
    losses, psnrs, cls_accs, mious = [], [], [], []
    # multi-chip runs render validation frames sharded over the mesh
    render = (system.render_sharded
              if system.mesh.shape.get("data", 1) > 1
              and hasattr(system, "render_sharded") else system.render)
    for i in range(min(len(val_ds), max_images)):
        sample = val_ds[i]
        out = render(state.params, sample["rays"])
        key = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
        pred = out[key].reshape(h, w, 3)
        gt = sample["rgbs"].reshape(h, w, 3)
        mask = sample.get("valid_mask")
        mask3 = np.broadcast_to(mask.reshape(h, w, 1), gt.shape) if mask is not None else None
        losses.append(float(np.mean((pred - gt) ** 2)))
        import jax.numpy as jnp
        psnrs.append(float(psnr_fn(jnp.asarray(pred), jnp.asarray(gt),
                                   jnp.asarray(mask3) if mask3 is not None else None)))

        cls_key = key.replace("rgb", "cls")
        if cls_key in out and "cls" in sample:
            from nerf_siren_tpu.training.metrics import miou as miou_fn
            pred_cls = np.argmax(out[cls_key], axis=-1)
            gt_cls = np.asarray(sample["cls"]).reshape(-1)
            cls_accs.append(float((pred_cls == gt_cls).mean()))
            n_cls = out[cls_key].shape[-1]
            m, _ = miou_fn(jnp.asarray(pred_cls), jnp.asarray(gt_cls), n_cls)
            mious.append(float(m))
            if i == 0:  # per-epoch class-map dump (reference system.py:365-380)
                from nerf_siren_tpu.utils.color import color_cls
                color_cls((np.clip(pred, 0, 1) * 255).astype(np.uint8),
                          pred_cls.reshape(h, w),
                          savedir=os.path.join("mid_results", exp_name),
                          prefix=f"step{step}_")

        if writer is not None and i == 0:
            depth = out[key.replace("rgb", "depth")].reshape(h, w)
            depth_vis = visualize_depth(depth).astype(np.float32) / 255.0
            triplet = np.concatenate([gt, pred, depth_vis], axis=1)  # side by side
            writer.add_image("val/GT_pred_depth", np.clip(triplet, 0, 1),
                             step, dataformats="HWC")
    val_loss = float(np.mean(losses))
    val_psnr = float(np.mean(psnrs))
    if writer is not None:
        writer.add_scalar("val/loss", val_loss, step)
        writer.add_scalar("val/psnr", val_psnr, step)
        if cls_accs:
            writer.add_scalar("val/cls_acc", float(np.mean(cls_accs)), step)
        if mious:
            writer.add_scalar("val/miou", float(np.mean(mious)), step)
    return val_loss, val_psnr


def main(hparams):
    from nerf_siren_tpu.datasets import dataset_dict
    from nerf_siren_tpu.training import checkpoints as ckpt_lib
    from nerf_siren_tpu.training.system import epoch_iterator

    if getattr(hparams, "multihost", False):
        # DDP-equivalent process-group init (reference train.py:47-63);
        # must run before any other jax call so every process sees the
        # global device set.
        from nerf_siren_tpu.parallel.multihost import initialize_distributed

        initialize_distributed(hparams.coordinator_address,
                               hparams.num_processes, hparams.process_id)
    shard_index, num_shards = jax.process_index(), jax.process_count()
    primary = shard_index == 0

    dataset_cls = dataset_dict[hparams.dataset_name]
    kwargs = dict(root_dir=hparams.root_dir, img_wh=tuple(hparams.img_wh))
    if hparams.dataset_name.startswith("llff"):
        kwargs["spheric_poses"] = hparams.spheric_poses
    if hparams.dataset_name == "blender_cls_ib" and getattr(hparams, "is_crop", False):
        kwargs.update(is_crop=True, crop_size=hparams.crop_size)
    train_ds = dataset_cls(split="train", **kwargs)
    val_ds = dataset_cls(split="val", **kwargs)

    steps_per_epoch = max(1, len(train_ds.all_rays) // hparams.batch_size)
    n_classes = getattr(train_ds, "n_classes", 0)
    system = build_system(hparams, train_ds.white_back, steps_per_epoch, n_classes)

    state = system.init_state(jax.random.PRNGKey(hparams.seed))
    start_epoch = 0
    if hparams.ckpt_path:  # full resume
        state, start_epoch = ckpt_lib.restore_train_state(hparams.ckpt_path, state)
        print(f"resumed from {hparams.ckpt_path} at epoch {start_epoch}, step {int(state.step)}")
    elif hparams.pretrained:  # warm start model weights only
        params = dict(state.params)
        params["coarse"] = ckpt_lib.load_ckpt(params["coarse"], hparams.pretrained,
                                              "nerf_coarse", hparams.prefixes_to_ignore)
        if "fine" in params:
            params["fine"] = ckpt_lib.load_ckpt(params["fine"], hparams.pretrained,
                                                "nerf_fine", hparams.prefixes_to_ignore)
        state = state.replace(params=params)
        print(f"warm-started from {hparams.pretrained}")

    writer = None
    if primary:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(os.path.join("logs", hparams.exp_name))
        except Exception:
            writer = None

    ckpt_dir = os.path.join("ckpts", hparams.exp_name)
    os.makedirs(ckpt_dir, exist_ok=True)
    saved: list = []  # (val_loss, path)
    checkpointer = ckpt_lib.AsyncCheckpointer()

    rng = jax.random.PRNGKey(hparams.seed + 1)
    extras = {"cls": train_ds.all_cls} if hasattr(train_ds, "all_cls") else None
    spd = getattr(hparams, "steps_per_dispatch", 1)
    import inspect
    scan_takes_cls = (hasattr(system, "train_scan_batches") and
                      "cls_b" in inspect.signature(
                          system.train_scan_batches).parameters)
    use_scan = (spd > 1 and hasattr(system, "train_scan_batches")
                and (extras is None
                     or (set(extras) == {"cls"} and scan_takes_cls)))

    def flush_group(state, group):
        kw = {}
        if "cls" in group[0]:
            kw["cls_b"] = np.stack([b["cls"] for b in group])
        return system.train_scan_batches(
            state, np.stack([b["rays"] for b in group]),
            np.stack([b["rgbs"] for b in group]), rng, **kw)

    for epoch in range(start_epoch, hparams.num_epochs):
        t0 = time.time()
        metrics: Dict = {}
        loss_samples: list = []  # device scalars; fetched once per epoch
        if use_scan:
            # group batches into one lax.scan program per `spd` steps —
            # identical math to per-batch train_step (same rng each call;
            # the pure step folds in state.step), amortizing dispatch
            # latency on tunneled runtimes
            group: list = []
            for batch in epoch_iterator(train_ds.all_rays, train_ds.all_rgbs,
                                        hparams.batch_size, hparams.seed, epoch,
                                        extras, shard_index=shard_index,
                                        num_shards=num_shards):
                group.append(batch)
                if len(group) == spd:
                    state, metrics = flush_group(state, group)
                    loss_samples.append(
                        metrics.get("train/loss", metrics.get("train/total_loss")))
                    group = []
            if group:  # epoch tail (one extra trace at most, same each epoch)
                state, metrics = flush_group(state, group)
                loss_samples.append(
                    metrics.get("train/loss", metrics.get("train/total_loss")))
        else:
            for batch in epoch_iterator(train_ds.all_rays, train_ds.all_rgbs,
                                        hparams.batch_size, hparams.seed, epoch, extras,
                                        shard_index=shard_index, num_shards=num_shards):
                state, metrics = system.train_step(state, batch, rng)
                loss_samples.append(
                    metrics.get("train/loss", metrics.get("train/total_loss")))
        step = int(state.step)
        if writer is not None:
            for k, v in metrics.items():
                writer.add_scalar(k, float(v), step)
            writer.add_scalar("lr", system.current_lr(state), step)
        dt = time.time() - t0
        line = f"epoch {epoch} step {step} " + " ".join(
            f"{k}={float(v):.4f}" for k, v in metrics.items()) + f" ({dt:.1f}s)"

        if primary and ((epoch + 1) % hparams.val_every == 0
                        or epoch == hparams.num_epochs - 1):
            if num_shards == 1:
                val_loss, val_psnr = validate(system, state, val_ds, writer, step,
                                              tuple(hparams.img_wh),
                                              exp_name=hparams.exp_name)
                line += f" val/loss={val_loss:.4f} val/psnr={val_psnr:.2f}"
            else:
                # image validation renders process-local arrays, which cannot
                # join a jit over the global mesh; rank by the EPOCH-MEAN
                # train loss (a single final batch is too noisy to decide
                # top-K retention — it can evict the best checkpoint)
                val_loss = (float(sum(loss_samples)) / len(loss_samples)
                            if loss_samples else 0.0)
            path = os.path.join(ckpt_dir, f"epoch={epoch}-step={step}.msgpack")
            # async: serialize+write overlap the next epoch's compute (the
            # device->host fetch happens here, so the snapshot is consistent)
            checkpointer.save_train_state(path, state, epoch + 1)
            saved.append((val_loss, path))
            saved.sort(key=lambda t: t[0])
            if len(saved) > hparams.save_topk:
                checkpointer.wait()  # never unlink a still-writing file
            for _, stale in saved[hparams.save_topk:]:
                if os.path.exists(stale):
                    os.remove(stale)
            saved = saved[: hparams.save_topk]
        if primary:
            print(line, flush=True)

    checkpointer.wait()  # all checkpoint files durable before returning
    if writer is not None:
        writer.close()
    return state


if __name__ == "__main__":
    main(get_opts())
