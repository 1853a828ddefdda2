"""Mesh + sharding utilities for SPMD data parallelism."""

from loans_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
