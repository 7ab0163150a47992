"""Optimizers and LR schedules on optax.

Covers the reference's optimizer zoo (reference: utils/__init__.py:11-50,
utils/optimizers.py, utils/warmup_scheduler.py): sgd / adam / radam / ranger
(radam + lookahead), with MultiStepLR / cosine / poly epoch schedules and the
gradual-warmup wrapper. Schedules are pure functions of the global step with
steps_per_epoch baked in, so the whole update is one jittable optax transform.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerf_siren_tpu.config import TrainConfig

_EPS = 1e-8


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> optax.Schedule:
    """Epoch-granular schedule matching torch's semantics (per-epoch steps)."""
    milestones = jnp.asarray(cfg.decay_step, dtype=jnp.float32)

    def epoch_of(step):
        return jnp.floor(step / steps_per_epoch)

    def base_schedule(step):
        e = epoch_of(step)
        if cfg.lr_scheduler == "steplr":
            n_passed = jnp.sum(e >= milestones)
            return cfg.lr * cfg.decay_gamma ** n_passed
        if cfg.lr_scheduler == "cosine":
            return _EPS + (cfg.lr - _EPS) * 0.5 * (1 + jnp.cos(jnp.pi * e / cfg.num_epochs))
        if cfg.lr_scheduler == "poly":
            return cfg.lr * (1 - e / cfg.num_epochs) ** cfg.poly_exp
        raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")

    if cfg.warmup_epochs > 0 and cfg.optimizer not in ("radam", "ranger"):
        def schedule(step):
            e = epoch_of(step)
            warm_frac = jnp.minimum(e / cfg.warmup_epochs, 1.0)
            if cfg.warmup_multiplier == 1.0:
                warm_lr = cfg.lr * warm_frac
            else:
                warm_lr = cfg.lr * ((cfg.warmup_multiplier - 1.0) * warm_frac + 1.0) / cfg.warmup_multiplier
            return jnp.where(e < cfg.warmup_epochs, warm_lr, base_schedule(step))
        return schedule
    return base_schedule


class LookaheadState(NamedTuple):
    fast_state: optax.OptState
    slow_params: optax.Params
    step: jax.Array


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (Ranger's second half, reference: utils/optimizers.py:266).

    Keeps slow weights in the optimizer state; every `sync_period` steps the
    fast weights are pulled toward the slow weights and the slow weights
    updated, expressed as an extra additive update (stateless w.r.t. params).
    """

    def init(params):
        return LookaheadState(inner.init(params), jax.tree_util.tree_map(jnp.copy, params),
                              jnp.zeros([], jnp.int32))

    def update(grads, state, params=None, **extra):
        updates, fast_state = inner.update(grads, state.fast_state, params, **extra)
        step = state.step + 1
        sync = (step % sync_period) == 0

        def on_sync(args):
            updates, slow, params = args
            fast_new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            slow_new = jax.tree_util.tree_map(
                lambda s, f: s + slow_step_size * (f - s), slow, fast_new)
            # update so that params_new == slow_new
            final_updates = jax.tree_util.tree_map(lambda s, p: s - p, slow_new, params)
            return final_updates, slow_new

        def no_sync(args):
            updates, slow, _ = args
            return updates, slow

        updates, slow_params = jax.lax.cond(sync, on_sync, no_sync,
                                            (updates, state.slow_params, params))
        return updates, LookaheadState(fast_state, slow_params, step)

    return optax.GradientTransformation(init, update)


def get_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Optimizer + schedule, by name (reference: utils/__init__.py:11-31)."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    wd = cfg.weight_decay
    if cfg.optimizer == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(learning_rate=schedule, momentum=cfg.momentum),
        )
    elif cfg.optimizer == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(learning_rate=schedule, eps=_EPS),
        )
    elif cfg.optimizer == "radam":
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.radam(learning_rate=schedule, eps=_EPS),
        )
    elif cfg.optimizer == "ranger":
        tx = lookahead(optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.radam(learning_rate=schedule, eps=_EPS),
        ))
    else:
        raise ValueError(f"optimizer not recognized: {cfg.optimizer!r}")
    return tx
