"""Debugging / observability utilities — the TPU counterparts of the
reference's aux subsystems (SURVEY §5.1/§5.2):

- `profile_trace`: jax.profiler trace context (→ Perfetto/TensorBoard),
  replacing torch.autograd.profiler + Lightning's profiler,
- `named_scope`: re-export of jax.named_scope, replacing
  torch record_function scoping (reference torch_utils/misc.py:102-109),
- `enable_nan_debug`: jax_debug_nans mode — compiled programs re-run
  un-jitted on NaN production and raise at the offending primitive,
- `check_replica_consistency`: parameter-fingerprint comparison across
  processes/restarts, the analogue of DDP param-hash verification
  (reference torch_utils/misc.py:182-196).
"""
from __future__ import annotations

import contextlib
from typing import Any, Optional

import jax
import numpy as np

from nerf_siren_tpu.parallel.mesh import cross_replica_param_hash

named_scope = jax.named_scope


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace viewable in Perfetto / TensorBoard profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debug(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)


def check_replica_consistency(params: Any,
                              reference_hash: Optional[float] = None,
                              atol: float = 1e-5) -> float:
    """Fingerprint `params`; if `reference_hash` is given, assert they match.

    In multi-host training, call on every host and compare the returned
    scalars (e.g. via jax.experimental.multihost_utils) — they must agree
    because params are replicated.
    """
    h = float(cross_replica_param_hash(params))
    if reference_hash is not None:
        if not np.isclose(h, reference_hash, atol=atol, rtol=1e-6):
            raise AssertionError(
                f"replica params diverged: hash {h} != reference {reference_hash}")
    return h


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (host-side check for tests/debug)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(f"non-finite values in {name}{key}")
