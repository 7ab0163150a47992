"""Batched row-wise searchsorted for TPU.

TPU-native replacement for the reference's vendored CUDA extension
(reference: torchsearchsorted/src/cuda/searchsorted_cuda_kernel.cu:41-142) and
for `torch.searchsorted` (reference: models/rendering.py:54).

On TPU, for the bin counts that occur in hierarchical sampling (tens to a few
hundred bins), an all-pairs comparison reduction on the VPU beats a binary
search: it is branch-free, fully vectorized, and XLA fuses the broadcast
compare + sum into a single pass. Complexity is O(A·V) per row but both A and V
are tiny and the arithmetic intensity is ideal for the 8x128 vector unit.

A log-step branchless binary search is also provided for large bin counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted(sorted_sequence: jax.Array, values: jax.Array, side: str = "left") -> jax.Array:
    """Row-wise searchsorted.

    Args:
      sorted_sequence: (..., A) sorted along the last axis.
      values: (..., V); leading dims must broadcast with `sorted_sequence`.
      side: 'left' → first index where insertion keeps order,
            'right' → last such index (numpy semantics).

    Returns:
      (..., V) int32 insertion indices in [0, A].
    """
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    a = sorted_sequence[..., None, :]   # (..., 1, A)
    v = values[..., :, None]            # (..., V, 1)
    if side == "right":
        cmp = a <= v
    else:
        cmp = a < v
    return jnp.sum(cmp, axis=-1).astype(jnp.int32)


def searchsorted_binary(sorted_sequence: jax.Array, values: jax.Array, side: str = "left") -> jax.Array:
    """Branchless binary-search variant, O(V·log A). Preferable when A is large.

    Matches `searchsorted` exactly (tested against it and numpy).
    """
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    A = sorted_sequence.shape[-1]
    n_steps = max(1, (A - 1).bit_length()) if A > 1 else 1

    lo = jnp.zeros(values.shape, jnp.int32)
    hi = jnp.full(values.shape, A, jnp.int32)

    def step(_, carry):
        lo, hi = carry
        mid = (lo + hi) // 2
        mid_val = jnp.take_along_axis(
            sorted_sequence, jnp.clip(mid, 0, A - 1), axis=-1
        )
        if side == "right":
            go_right = mid_val <= values
        else:
            go_right = mid_val < values
        # fixed iteration count: once lo == hi the search has converged and
        # further steps must be no-ops (else lo overshoots past A)
        active = lo < hi
        lo = jnp.where(go_right & active, mid + 1, lo)
        hi = jnp.where(go_right | ~active, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_steps + 1, step, (lo, hi))
    return lo
