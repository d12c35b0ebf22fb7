"""Multi-host initialisation (replaces the reference's implied
torchrun/NCCL setup that it scaffolds but never initialises,
TrainerUtil.py:79-81, SURVEY.md §2.3).

Single-slice multi-chip needs nothing: `make_mesh()` spans all local chips
and XLA rides ICI. Multi-host (pod slices / DCN) uses
`jax.distributed.initialize`, after which `jax.devices()` is global and the
same data mesh spans hosts; per-host data loading feeds
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialise multi-host JAX when the standard env (JAX_COORDINATOR_*,
    or explicit args) is present; no-op single-host otherwise. Returns True
    when running distributed."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    # explicit args win over the environment even when falsy (process_id=0
    # is rank 0, not "unset" — `or` would let a leaked JAX_PROCESS_ID shadow
    # the coordinator's rank)
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", 1))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", 0))
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_coordinator() -> bool:
    """Rank-0 equivalent for logging/checkpoint IO (reference local_rank==0
    gates, TrainerUtil.py:177-184)."""
    return jax.process_index() == 0


def local_batch_to_global(mesh, batch, sharded_keys=()):
    """Assemble a host-local batch dict into global arrays on a pod.

    The trainer's batch contract (train/trainer.py make_train_step) is a
    REPLICATED full frame — pose [4,4], image [H,W,3], eye [1], auds — with
    the sampled per-ray tensors sharded inside the jitted step, so every
    host loads the same frame and every key defaults to P() (replicated).
    Pass key names in `sharded_keys` only for arrays that genuinely carry a
    per-host leading data axis (none in the current recipe)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in batch.items():
        spec = P("data") if k in sharded_keys else P()
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v)
    return out
