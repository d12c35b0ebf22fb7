"""Device-mesh / sharding utilities (replaces the reference's DDP/NCCL
scaffolding, TrainerUtil.py:79-81)."""

from .mesh import make_mesh, shard_batch, replicate, data_sharding
