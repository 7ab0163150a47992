"""Cross-process training-statistics collection (reference:
torch_utils/training_stats.py — Collector/report with moment accumulation and
broadcast sync; present-but-unwired in the reference training loop).

TPU-native design: statistics are accumulated as (count, sum, sum-of-squares)
moment triples — pure pytree state, so they live inside jit and sync across
a mesh with one `psum`. Host-side `Collector` mirrors the reference's API
(report / as_dict / mean / std).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Moments = jnp.ndarray  # shape (3,): [count, sum, sum_sq]


def init_moments() -> Moments:
    return jnp.zeros((3,), jnp.float32)


def report(moments: Moments, value: jax.Array) -> Moments:
    """Accumulate a scalar or array of values into the moment triple.
    Pure — usable inside jit."""
    v = jnp.asarray(value, jnp.float32).reshape(-1)
    return moments + jnp.stack([jnp.asarray(v.size, jnp.float32),
                                jnp.sum(v), jnp.sum(v ** 2)])


def cross_replica_sum(moments: Moments, axis_name: str) -> Moments:
    """Sync moments across a mesh axis (inside shard_map/pmap contexts)."""
    return jax.lax.psum(moments, axis_name)


def mean(moments: Moments) -> jax.Array:
    return moments[1] / jnp.maximum(moments[0], 1.0)


def std(moments: Moments) -> jax.Array:
    m = mean(moments)
    var = moments[2] / jnp.maximum(moments[0], 1.0) - m ** 2
    return jnp.sqrt(jnp.maximum(var, 0.0))


class Collector:
    """Host-side stat registry (reference training_stats.Collector)."""

    def __init__(self):
        self._moments: Dict[str, np.ndarray] = {}

    def report(self, name: str, value) -> None:
        v = np.asarray(value, np.float64).reshape(-1)
        m = self._moments.setdefault(name, np.zeros(3))
        m += [v.size, v.sum(), (v ** 2).sum()]

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return m[1] / m[0]

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        mu = m[1] / m[0]
        return float(np.sqrt(max(m[2] / m[0] - mu ** 2, 0.0)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {k: {"num": float(m[0]), "mean": self.mean(k), "std": self.std(k)}
                for k, m in self._moments.items()}

    def reset(self) -> None:
        self._moments.clear()
