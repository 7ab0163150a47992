"""Fused bias + activation (+gain +clamp).

Semantics of the reference's bias_act (reference:
torch_utils/ops/bias_act.py:22-33 activation table, :92-122 ref path). On TPU
this needs no custom kernel: XLA fuses the bias add, activation, gain and
clamp into the producing matmul/conv epilogue. The activation table carries
each function's default gain (sqrt(2) for relu/lrelu/swish).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class _Act(NamedTuple):
    fn: callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _Act(lambda x, alpha: x, 0.0, 1.0),
    "relu": _Act(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2)),
    "lrelu": _Act(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, math.sqrt(2)),
    "tanh": _Act(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _Act(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _Act(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _Act(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _Act(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _Act(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2)),
}


def bias_act(x: jax.Array, b: Optional[jax.Array] = None, *, dim: int = 1,
             act: str = "linear", alpha: Optional[float] = None,
             gain: Optional[float] = None, clamp: Optional[float] = None) -> jax.Array:
    """y = clamp(gain * act(x + b), ±clamp); b broadcast along `dim`."""
    spec = activation_funcs[act]
    alpha = spec.def_alpha if alpha is None else alpha
    gain = spec.def_gain if gain is None else gain

    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    x = spec.fn(x, alpha)
    if gain != 1:
        x = x * gain
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
