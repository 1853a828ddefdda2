"""Multi-host initialization + cross-host utilities.

The reference's multi-device story ends at single-host
``MultiprocessParallelUpdater`` (``schaaaafrichter/train.py:189-191``).
Because the train step here is a pure SPMD program over a Mesh, going
multi-host only requires initializing the jax distributed runtime and
building the mesh from ``jax.devices()`` (which then spans hosts; data
loading shards per-process). No training code changes.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize ``jax.distributed`` (no-op in single-process runs).

    With no arguments, relies on the cluster environment
    (TPU pod metadata / JAX_COORDINATOR_ADDRESS etc.). Must run before
    any JAX computation touches a backend — do NOT probe
    ``jax.process_count()``/``jax.devices()`` first, that initializes
    the local backend and makes distributed init impossible.
    """
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # idempotent: fine if the runtime is already up. jax 0.9 raises
        # "distributed.initialize should only be called once." (and
        # older versions "...already initialized").
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            return
        if explicit:
            raise
    except ValueError:
        # no cluster environment to auto-detect: stay single-process
        if explicit:
            raise


def local_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start, size) of this process's slice of a globally-sharded batch.

    Hosts feed only their local shard; ``jax.make_array_from_process_
    local_data`` (or ``shard_batch`` on a single host) assembles the
    global array.
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    per = global_batch // n
    return jax.process_index() * per, per


def assemble_global_batch(mesh, host_batch, axis_name: str = "data"):
    """Build a globally-sharded array from per-process local data.

    On a single process this is exactly ``shard_batch``; across
    processes each host contributes its slice.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), host_batch
        )

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(put, host_batch)
