"""Multi-host (multi-process) distributed training support.

The reference scales with Lightning DDP: one process per GPU, NCCL gradient
allreduce, DistributedSampler feeding each process a disjoint data shard
(reference: train.py:47-63). The TPU-native equivalent over ICI/DCN
(SURVEY §5.8):

- `jax.distributed.initialize()` — DCN coordination; every process sees the
  global device set afterwards.
- one `Mesh` over ALL processes' devices, params replicated, rays sharded on
  the `data` axis; jit inserts the gradient psum (ICI within a slice, DCN
  across slices).
- each host loads/draws only its interleaved slice of the ray buffer
  (`utils.dnn.infinite_batches(shard_index, num_shards)` — the
  DistributedSampler role) and contributes its rows to the global batch via
  `jax.make_array_from_process_local_data`.

Verified by a real 2-process CPU integration test
(tests/test_multihost.py) asserting byte-identical params across processes
after several train steps — the analogue of the reference's
check_ddp_consistency (torch_utils/misc.py:182-196).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Call jax.distributed.initialize, reading env defaults.

    Env fallbacks (useful for launchers that export them):
    NERF_TPU_COORDINATOR, NERF_TPU_NUM_PROCESSES, NERF_TPU_PROCESS_ID.
    On Cloud TPU pods all three may be omitted — jax auto-detects from the
    TPU metadata server.
    """
    coordinator_address = coordinator_address or os.environ.get("NERF_TPU_COORDINATOR")
    if num_processes is None and "NERF_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NERF_TPU_NUM_PROCESSES"])
    if process_id is None and "NERF_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["NERF_TPU_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints (host 0)."""
    return jax.process_index() == 0


def global_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Assemble each host's local batch rows into one global sharded array.

    Single-process: a plain device_put with the row sharding (identical to
    parallel.mesh.shard_rays). Multi-process: every host passes its LOCAL
    rows (global_batch_size / process_count of them) and receives a handle
    to the global (batch, ...) array — addressable shards are backed by the
    local rows, no cross-host data movement.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
