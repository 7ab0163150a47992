"""Parameter sharding layouts.

Data parallelism (params replicated, rays sharded) is the parity surface with
the reference's DDP (SURVEY §2.5). For scale-out headroom the NeRF MLP can
additionally be tensor-sharded over a 'model' mesh axis: hidden-layer kernels
split on the width dimension, alternating output-dim / input-dim sharding so
XLA chains matmuls with at most one collective per pair of layers. Heads and
small layers stay replicated (their collectives would cost more than the
compute saved).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def nerf_param_sharding(mesh: Mesh, params: Dict[str, Any], model_axis: str = "model"):
    """A sharding pytree matching `init_nerf` params.

    Trunk layer i: even i shards the kernel output dim on `model_axis` (bias
    follows), odd i shards the input dim (bias replicated) — the classic
    column-/row-parallel alternation.
    """
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        repl = _ns(mesh)
        return jax.tree_util.tree_map(lambda _: repl, params)

    def shard_layer(i):
        if i % 2 == 0:  # column parallel: split output features
            return {"kernel": _ns(mesh, None, model_axis), "bias": _ns(mesh, model_axis)}
        return {"kernel": _ns(mesh, model_axis, None), "bias": _ns(mesh)}  # row parallel

    repl_layer = {"kernel": _ns(mesh), "bias": _ns(mesh)}
    sharding = {
        "xyz_layers": [shard_layer(i) for i in range(len(params["xyz_layers"]))],
        "xyz_final": repl_layer,
        "sigma": repl_layer,
        "dir_layer": repl_layer,
        "rgb": repl_layer,
    }
    if "parse" in params:
        sharding["parse"] = [repl_layer, dict(repl_layer)]
    return sharding


def model_params_sharding(mesh: Mesh, params: Dict[str, Any], model_axis: str = "model"):
    """Sharding for the full {'coarse': ..., 'fine': ...} param dict."""
    return {k: nerf_param_sharding(mesh, v, model_axis) for k, v in params.items()}
