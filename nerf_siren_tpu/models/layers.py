"""Parameter initializers and tiny functional layers.

Models in this framework are plain pytrees (nested dicts of jnp arrays) plus
pure apply functions — no module system. This keeps the whole forward pass a
single traced function (ideal for XLA fusion / pjit partitioning) and makes
name-prefix partial checkpoint loading (reference: utils/__init__.py:56-86)
a trivial dict operation.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


def init_linear(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """Torch-compatible default Linear init.

    kaiming_uniform(a=sqrt(5)) on the weight collapses to U(-1/sqrt(fan_in),
    1/sqrt(fan_in)); bias uses the same bound. Matching the reference's
    initialization distribution keeps converged-metric parity comparisons fair.
    """
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(k_w, (in_dim, out_dim), dtype, -bound, bound),
        "bias": jax.random.uniform(k_b, (out_dim,), dtype, -bound, bound),
    }


def init_linear_uniform(key: jax.Array, in_dim: int, out_dim: int, bound: float, dtype=jnp.float32) -> Params:
    """Linear with U(-bound, bound) weight (SIREN-style inits) and torch-default bias."""
    k_w, k_b = jax.random.split(key)
    b_bias = 1.0 / math.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(k_w, (in_dim, out_dim), dtype, -bound, bound),
        "bias": jax.random.uniform(k_b, (out_dim,), dtype, -b_bias, b_bias),
    }


def linear(params: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """y = x @ W + b with f32 MXU accumulation.

    `compute_dtype` optionally casts operands (bf16 for inference speed) while
    keeping the accumulator in float32 via preferred_element_type.
    """
    w, b = params["kernel"], params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)
