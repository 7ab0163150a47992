"""Checkpoint save/load with name-prefix partial loading.

The reference stores one flat Lightning state_dict and warm-starts submodels
by filtering name prefixes (reference: utils/__init__.py:56-86,
utils/save_weights_only.py). Here checkpoints are msgpack-serialized pytrees
keyed by model name ({'nerf_coarse': ..., 'nerf_fine': ..., 'points': ...,
'eg3d_renderer': ...}), so partial loads are dict selections and the
"weights-only portable scene" export is the natural format (~5 MB models).

Full training resume additionally stores step / optimizer state.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, tree: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(_to_numpy(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def extract_model_state(
    ckpt: Dict[str, Any],
    model_name: str,
    prefixes_to_ignore: Iterable[str] = ("loss",),
) -> Optional[Dict[str, Any]]:
    """Select one model's params from a checkpoint (reference: utils/__init__.py:56-71)."""
    if model_name in tuple(prefixes_to_ignore):
        return None
    # full-resume checkpoints nest models under 'params'
    src = ckpt.get("params", ckpt)
    return src.get(model_name)


def merge_params(params: Any, loaded: Any, stats: Optional[Dict[str, int]] = None) -> Any:
    """Non-strict merge: take loaded leaves where structure+shape match,
    keep existing params elsewhere (reference: utils/__init__.py:73-86).

    `stats` (optional dict) accumulates 'taken' / 'skipped_shape' /
    'missing' leaf counts so callers can detect a load that silently
    did nothing (see load_ckpt)."""
    def _count(key):
        if stats is not None:
            stats[key] = stats.get(key, 0) + 1

    if loaded is None:
        if stats is not None:
            stats["missing"] = stats.get("missing", 0) + len(
                jax.tree_util.tree_leaves(params))
        return params
    if isinstance(params, dict) and isinstance(loaded, dict):
        return {k: merge_params(v, loaded.get(k), stats) if k in loaded
                else merge_params(v, None, stats)
                for k, v in params.items()}
    if isinstance(params, (list, tuple)) and isinstance(loaded, (list, tuple, dict)):
        # msgpack restores lists as dicts with int-string keys in some versions
        if isinstance(loaded, dict):
            loaded = [loaded.get(str(i), loaded.get(i)) for i in range(len(params))]
        out = [merge_params(p, l, stats) for p, l in zip(params, loaded)]
        return type(params)(out) if isinstance(params, tuple) else out
    # leaves
    try:
        if hasattr(params, "shape") and hasattr(loaded, "shape") and params.shape != loaded.shape:
            _count("skipped_shape")
            return params
    except Exception:
        _count("skipped_shape")
        return params
    _count("taken")
    return loaded


def load_ckpt(params: Any, path: str, model_name: str,
              prefixes_to_ignore: Iterable[str] = ("loss",)) -> Any:
    """Warm-start `params` for `model_name` from a checkpoint file, non-strict.

    Non-strict like the reference (utils/__init__.py:73-86), but LOUD about
    loads that do nothing: a checkpoint with no `model_name` subtree, or
    whose leaves all mismatch in shape, leaves the random init in place —
    which downstream looks exactly like a trained-but-terrible model (this
    silently produced near-chance semantic eval maps once). Prints a
    warning instead of raising so legitimate partial warm-starts keep
    working."""
    if not path:
        return params
    ckpt = load_checkpoint(path)
    sub = extract_model_state(ckpt, model_name, prefixes_to_ignore)
    if model_name in tuple(prefixes_to_ignore):
        return params
    stats: Dict[str, int] = {}
    merged = merge_params(params, sub, stats)
    if sub is None:
        print(f"WARNING: checkpoint {path} has no '{model_name}' "
              f"parameters - keeping the (random) init", flush=True)
    elif stats.get("taken", 0) == 0:
        print(f"WARNING: checkpoint {path} matched ZERO '{model_name}' "
              f"leaves ({stats.get('skipped_shape', 0)} shape mismatches, "
              f"{stats.get('missing', 0)} missing) - keeping the (random) "
              f"init", flush=True)
    elif stats.get("skipped_shape", 0):
        print(f"NOTE: '{model_name}' load from {path}: "
              f"{stats['taken']} leaves taken, "
              f"{stats['skipped_shape']} skipped on shape mismatch",
              flush=True)
    return merged


# -- full training-state checkpoints (resume) ---------------------------------

_MODEL_KEY_MAP = {"coarse": "nerf_coarse", "fine": "nerf_fine",
                  "points": "points", "eg3d_renderer": "eg3d_renderer"}


def params_to_named(params: Dict[str, Any]) -> Dict[str, Any]:
    """Internal param keys → the reference's checkpoint naming
    (nerf_coarse/nerf_fine/points/eg3d_renderer, SURVEY §5.4)."""
    return {_MODEL_KEY_MAP.get(k, k): v for k, v in params.items()}


def named_to_params(named: Dict[str, Any]) -> Dict[str, Any]:
    inv = {v: k for k, v in _MODEL_KEY_MAP.items()}
    return {inv.get(k, k): v for k, v in named.items()}


def save_train_state(path: str, state: Any, epoch: int) -> None:
    """Save a full TrainState (params + optimizer + step) for exact resume
    (reference: Trainer(resume_from_checkpoint=...), train.py:43,57)."""
    tree = {
        "params": params_to_named(state.params),
        "opt_state": serialization.to_state_dict(_to_numpy(state.opt_state)),
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }
    save_checkpoint(path, tree)


class AsyncCheckpointer:
    """Overlap checkpoint IO with training.

    The device→host fetch (`_to_numpy`) runs on the CALLING thread — it
    must see a consistent state — and only the serialize + atomic write
    are handed to a single background worker. `wait()` joins the last
    pending write; pending writes are serialized (one worker) so top-K
    retention logic downstream sees files appear in save order. A large
    EG3D train state is ~115 MB (~1 s of msgpack + disk), which this hides
    behind the next epoch's compute."""

    def __init__(self):
        import concurrent.futures

        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._pending: list = []

    def _drain_done(self) -> None:
        # surface background write failures (disk full, permissions) instead
        # of silently keeping phantom paths in the caller's top-K list. The
        # pending list is pruned BEFORE raising, so one failed write is
        # reported exactly once and later futures stay tracked and joined.
        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        self._raise_first(done)

    @staticmethod
    def _raise_first(futures) -> None:
        err = None
        for fut in futures:  # join ALL before raising — no abandoned writes
            try:
                fut.result()
            except Exception as e:  # noqa: BLE001 — surfaced to the caller
                if err is None:
                    err = e
        if err is not None:
            raise err

    def save_train_state(self, path: str, state: Any, epoch: int) -> None:
        self._drain_done()
        tree = {
            "params": params_to_named(_to_numpy(state.params)),
            "opt_state": serialization.to_state_dict(_to_numpy(state.opt_state)),
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
        }
        self._pending.append(self._pool.submit(save_checkpoint, path, tree))

    def wait(self) -> None:
        pending, self._pending = self._pending, []
        self._raise_first(pending)


def restore_train_state(path: str, state_template: Any):
    """Restore (TrainState, next_epoch) into the template's structure."""
    ckpt = load_checkpoint(path)
    params = merge_params(state_template.params, named_to_params(ckpt["params"]))
    opt_state = serialization.from_state_dict(state_template.opt_state, ckpt["opt_state"])
    new_state = state_template.replace(
        step=jax.numpy.asarray(ckpt["step"]),
        params=params,
        opt_state=opt_state,
    )
    return new_state, int(ckpt["epoch"])
