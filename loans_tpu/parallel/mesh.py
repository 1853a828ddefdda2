"""Device mesh + sharding helpers.

The reference's only multi-device story is chainer's
``MultiprocessParallelUpdater`` (fork-per-GPU + NCCL all-reduce,
``schaaaafrichter/train.py:189-191``). The TPU-native equivalent is SPMD:
one jitted train step over a ``jax.sharding.Mesh`` with the batch sharded
on a ``data`` axis and parameters replicated; XLA inserts the gradient
all-reduce over ICI automatically. BatchNorm statistics become *global*
batch statistics for free (the partitioner turns the batch-mean into an
all-reduce), which is strictly stronger than the reference's per-device
BN.

The same program scales to multi-host DCN via ``jax.distributed`` without
change; tests exercise it on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    devices: Sequence[jax.Device] | None = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a host batch pytree with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated on the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
