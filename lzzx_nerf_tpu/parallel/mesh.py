"""Mesh + sharding helpers.

The reference is single-GPU with dormant DDP scaffolding (SyncBatchNorm +
DistributedDataParallel wrap, never launched — TrainerUtil.py:79-81). The
TPU-native equivalent is a 1-D `data` mesh over the per-step ray batch:
parameters are replicated, rays/pixels are sharded, and XLA inserts the
gradient psum over ICI. Multi-host extends the same mesh over
jax.distributed processes; nothing in the trainer changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_name: str = "data", devices: Optional[Sequence] = None) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray/pixel) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# keys that are genuinely per-ray (leading axis = ray). Full-frame tensors
# (image [H,W,3], masks, bg_color, pose, auds) are REPLICATED: the train step
# samples random pixels from them inside jit, so row-sharding them would just
# force cross-device gathers. Ray-level sharding happens inside the step via
# with_sharding_constraint on the sampled per-ray tensors (trainer.py).
_BATCH_SHARDED_KEYS = {"rays_o", "rays_d", "noise", "inds"}


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a provider batch on the mesh: per-ray arrays sharded along their
    leading axis, everything else (full frames, per-frame scalars) replicated."""
    ds = data_sharding(mesh, axis_name)
    rep = replicate(mesh)
    out = {}
    for k, v in batch.items():
        if k in _BATCH_SHARDED_KEYS and hasattr(v, "shape") and v.ndim >= 1:
            out[k] = jax.device_put(v, ds)
        else:
            out[k] = jax.device_put(v, rep)
    return out
