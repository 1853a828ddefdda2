"""Mesh + sharding utilities for SPMD data parallelism."""

from loans_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from loans_tpu.parallel.distributed import (
    assemble_global_batch,
    initialize_distributed,
    local_batch_slice,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "assemble_global_batch",
    "initialize_distributed",
    "local_batch_slice",
]
