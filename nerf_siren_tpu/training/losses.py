"""Training losses.

Parity with the reference loss zoo (reference: losses.py:10-102):
- mse: coarse MSE + fine MSE when present.
- msece: weighted MSE + cross-entropy on class logits (ignore_index=-1),
  split returned as {'sum','rgb','cls'}.
- msenll: MSE + NLL over log-softmax class outputs, fixed 0.99/0.01 weighting.

All are pure functions of (outputs dict, targets); reductions are masked means
so ignore labels work with static shapes on TPU.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def mse_loss(outputs: Dict[str, jax.Array], rgb_target: jax.Array, **_) -> Dict[str, jax.Array]:
    loss = _mse(outputs["rgb_coarse"], rgb_target)
    if "rgb_fine" in outputs:
        loss = loss + _mse(outputs["rgb_fine"], rgb_target)
    return {"sum": loss, "rgb": loss}


def _masked_ce(logits: jax.Array, labels: jax.Array, ignore_index: int = -1) -> jax.Array:
    """Mean cross-entropy over labels != ignore_index (softmax applied here)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def _masked_nll(logp: jax.Array, labels: jax.Array, ignore_index: int = -100) -> jax.Array:
    """Mean NLL over already-log-probability inputs (torch F.nll_loss semantics)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count


def msece_loss(
    outputs: Dict[str, jax.Array],
    rgb_target: jax.Array,
    cls_target: jax.Array = None,
    weight: float = 0.0,
    **_,
) -> Dict[str, jax.Array]:
    """weight * MSE + (1-weight) * CE (reference: losses.py:23-59)."""
    cls_target = cls_target.reshape(-1).astype(jnp.int32)
    mse_l = _mse(outputs["rgb_coarse"].reshape(-1, 3), rgb_target.reshape(-1, 3))
    ce_l = _masked_ce(outputs["cls_coarse"], cls_target, ignore_index=-1)
    if "rgb_fine" in outputs:
        mse_l = mse_l + _mse(outputs["rgb_fine"].reshape(-1, 3), rgb_target.reshape(-1, 3))
        ce_l = ce_l + _masked_ce(outputs["cls_fine"], cls_target, ignore_index=-1)
    mse_l = mse_l * weight
    ce_l = ce_l * (1.0 - weight)
    return {"sum": mse_l + ce_l, "rgb": mse_l, "cls": ce_l}


def msenll_loss(
    outputs: Dict[str, jax.Array],
    rgb_target: jax.Array,
    cls_target: jax.Array = None,
    weight: float = 0.99,
    **_,
) -> Dict[str, jax.Array]:
    """0.99*MSE + 0.01*NLL over log-softmax cls outputs (reference: losses.py:62-100).

    `outputs['cls_*']` are expected to already be log-probabilities, as
    produced by the semantic render path's log_softmax compositing.
    """
    cls_target = cls_target.reshape(-1).astype(jnp.int32)
    rgb_l = _mse(outputs["rgb_coarse"].reshape(-1, 3), rgb_target.reshape(-1, 3))
    cls_l = _masked_nll(outputs["cls_coarse"], cls_target)
    if "rgb_fine" in outputs:
        rgb_l = rgb_l + _mse(outputs["rgb_fine"].reshape(-1, 3), rgb_target.reshape(-1, 3))
        cls_l = cls_l + _masked_nll(outputs["cls_fine"], cls_target)
    rgb_l = rgb_l * weight
    cls_l = cls_l * (1.0 - weight)
    return {"sum": rgb_l + cls_l, "rgb": rgb_l, "cls": cls_l}


loss_dict = {"mse": mse_loss, "msece": msece_loss, "msenll": msenll_loss}
