"""General DNN infra utilities (reference: dnnlib/util.py, torch_utils/misc.py).

- EasyDict: attribute-access dict (reference dnnlib/util.py:42),
- construct_class_by_name: build an object from a dotted class path
  (reference dnnlib/util.py:303),
- param_summary: parameter-count table per top-level module
  (reference torch_utils/misc.py:198-268 print_module_summary),
- infinite_batches: infinite shuffled batch stream with per-host sharding
  (reference torch_utils/misc.py:113-147 InfiniteSampler).
"""
from __future__ import annotations

import importlib
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


class EasyDict(dict):
    """dict with attribute access."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


def get_obj_by_name(name: str) -> Any:
    """Resolve 'pkg.module.Attr' to the attribute."""
    module_name, _, attr = name.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def construct_class_by_name(class_name: str, *args, **kwargs) -> Any:
    return get_obj_by_name(class_name)(*args, **kwargs)


def param_count(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def param_summary(params: Dict[str, Any], title: str = "params") -> str:
    """Formatted per-submodule parameter table; returns the string."""
    rows = [(k, param_count(v)) for k, v in params.items()] \
        if isinstance(params, dict) else [("all", param_count(params))]
    total = sum(n for _, n in rows)
    width = max([len(k) for k, _ in rows] + [len(title)])
    lines = [f"{title:<{width}}  #params"]
    for k, n in sorted(rows, key=lambda r: -r[1]):
        lines.append(f"{k:<{width}}  {n:>12,}")
    lines.append(f"{'total':<{width}}  {total:>12,}")
    return "\n".join(lines)


def infinite_batches(
    arrays: Dict[str, np.ndarray],
    batch_size: int,
    seed: int = 0,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled batches over row-aligned arrays; with
    shard_index/num_shards each host sees a disjoint interleaved subset
    (the per-host data sharding of SURVEY §5.8)."""
    n = len(next(iter(arrays.values())))
    local = np.arange(shard_index, n, num_shards)
    rng = np.random.default_rng(seed + shard_index)
    order = rng.permutation(local)
    pos = 0
    while True:
        if pos + batch_size > len(order):
            order = rng.permutation(local)
            pos = 0
        idx = order[pos: pos + batch_size]
        pos += batch_size
        yield {k: v[idx] for k, v in arrays.items()}
