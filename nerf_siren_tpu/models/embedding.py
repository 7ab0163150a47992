"""NeRF positional (Fourier-feature) encoding.

Output layout matches the reference embedding exactly (reference:
models/nerf.py:4-38): ``[x, sin(f0·x), cos(f0·x), sin(f1·x), cos(f1·x), ...]``
with log-spaced frequencies 2^0..2^(N-1) (or linear 1..2^(N-1)); each term has
the same channel count as x.

TPU note: implemented as one broadcasted multiply + sin/cos + reshape so XLA
emits a single fused VPU loop; no Python-level per-frequency loop survives
tracing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def embedding_out_channels(in_channels: int, n_freqs: int) -> int:
    return in_channels * (2 * n_freqs + 1)


def _freq_bands(n_freqs: int, logscale: bool, dtype) -> jax.Array:
    if logscale:
        return 2.0 ** jnp.linspace(0.0, n_freqs - 1, n_freqs, dtype=dtype)
    return jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs, dtype=dtype)


def positional_encoding(x: jax.Array, n_freqs: int, logscale: bool = True) -> jax.Array:
    """Embed x -> (x, sin(2^k x), cos(2^k x), ...).

    Args:
      x: (..., C)
    Returns:
      (..., C * (2*n_freqs + 1))
    """
    if n_freqs == 0:
        return x
    freqs = _freq_bands(n_freqs, logscale, x.dtype)          # (F,)
    xb = x[..., None, None, :] * freqs[:, None, None]        # (..., F, 1, C)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # (..., F, 2, C)
    enc = enc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    return jnp.concatenate([x, enc], axis=-1)
