"""Explicit-collective data-parallel training step (shard_map + psum).

The default training path relies on jit's automatic partitioner to insert the
gradient all-reduce (parallel/mesh.py). This module provides the same step
with EXPLICIT collectives — `shard_map` over the data axis, per-shard
forward/backward, `jax.lax.psum` of gradients and metrics over ICI — for
users who want manual control of the communication schedule (e.g. to overlap
or fuse collectives) and as an executable specification of what the automatic
path must compute: both paths are asserted equal in tests.

This is the TPU-native analogue of writing DDP by hand instead of using the
framework wrapper (reference: Lightning DDP, train.py:47-63).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Deliberately the EXPERIMENTAL shard_map with check_rep=False: in jax 0.9's
# `jax.shard_map`, outputs derived from a jax.grad computed inside the mapped
# function lose their replication (vma) tracking, and the out_specs=P()
# "repair" inserts an EXTRA psum — psum(g)/n, pmean(g), even g/n-then-psum
# all come out n× too large (minimal repro in tests/test_shard_train.py's
# history). The experimental API with check_rep=False trusts the explicit
# collectives and is numerically correct.
#
# Version-proofing: when a jax upgrade removes the experimental module, fall
# back to the public `jax.shard_map` with vma checking disabled (check_vma is
# the new name for check_rep). Whether the fallback is numerically correct on
# that jax version is verified by the canary —
# tests/test_shard_train.py::test_shard_map_step_matches_auto_partitioned
# asserts this step's params match the auto-partitioned path bit-for-bit, so
# a jax bump that reintroduces the extra-psum bug fails the suite loudly
# instead of silently training with n×-scaled gradients.
try:
    import warnings
    with warnings.catch_warnings():
        # the deprecation shim warns on import; the experimental API is
        # still the numerically-correct choice here (see above) and the
        # canary test guards the eventual migration
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.experimental.shard_map import (
            shard_map as _shard_map_experimental)

    def _shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map_experimental(f, mesh=mesh, in_specs=in_specs,
                                       out_specs=out_specs, check_rep=False)
except ImportError:  # jax >= the experimental API's removal
    def _shard_map(f, *, mesh, in_specs, out_specs):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

# public alias: the version-proofed shard_map for other modules
# (e.g. NeRFSystem.render_sharded); same canary-test coverage
shard_map_compat = _shard_map

from nerf_siren_tpu.config import NeRFConfig, RenderConfig
from nerf_siren_tpu.render.rendering import render_rays
from nerf_siren_tpu.training.losses import mse_loss


def make_shard_map_train_step(
    mesh: Mesh,
    tx,
    render_cfg: RenderConfig,
    nerf_cfg: NeRFConfig = NeRFConfig(),
    axis: str = "data",
):
    """Build a jitted train step with explicit psum collectives.

    Returns step(params, opt_state, rays, rgbs, rng) →
    (params, opt_state, metrics). `rays`/`rgbs` are sharded on `axis`;
    params/opt_state replicated.
    """

    # NOTE: use the static mesh size, NOT jax.lax.psum(1, axis) — under the
    # new shard_map's vma tracking a psum of a replicated python constant
    # silently evaluates to 1 (measured), which would leave the gradients
    # summed instead of averaged.
    n_shards = mesh.shape[axis]

    def per_shard(params, rays, rgbs, rng):
        # every device computes its shard's gradient, then ALL-REDUCES:
        # the mean over the global batch = mean of per-shard means (equal
        # shard sizes), so psum(grad)/axis_size reproduces the global grad
        def loss_fn(p):
            out = render_rays(p, rays, render_cfg, rng, nerf_cfg=nerf_cfg)
            return mse_loss(out, rgbs)["sum"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis) / n_shards, grads)
        loss = jax.lax.psum(loss, axis) / n_shards
        return grads, loss

    sharded = _shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
    )

    @jax.jit
    def step(params, opt_state, rays, rgbs, rng):
        grads, loss = sharded(params, rays, rgbs, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, {"train/loss": loss}

    return step
