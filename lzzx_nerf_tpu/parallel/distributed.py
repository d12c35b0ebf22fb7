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
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", 0)),
    )
    return True


def is_coordinator() -> bool:
    """Rank-0 equivalent for logging/checkpoint IO (reference local_rank==0
    gates, TrainerUtil.py:177-184)."""
    return jax.process_index() == 0


def local_batch_to_global(mesh, batch):
    """Assemble a host-local batch dict into global arrays sharded over the
    mesh's data axis (per-host dataloading on pods)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in batch.items():
        sh = NamedSharding(mesh, P("data") if getattr(v, "ndim", 0) >= 1 else P())
        out[k] = jax.make_array_from_process_local_data(sh, v)
    return out
