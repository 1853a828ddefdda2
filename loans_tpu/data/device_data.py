"""Device-resident datasets: upload the whole pool to HBM once, gather
batches on-device by index.

The reference streams every batch host->GPU per iteration (chainer
``MultithreadIterator`` + ``concat_examples`` copies,
``train_sheep_localizer.py:113-116``, ``sheep_updater.py:32-38``). On
this TPU setup the host<->device link (a development tunnel) is the
end-to-end bottleneck: round-1 measured 120-320 img/s wall vs 1956
img/s pure compute. For the in-memory synthetic datasets the entire
pool fits comfortably in HBM (2048 scenes @ 224x224 uint8 = 308 MB on a
16 GB chip), so the TPU-native answer is to ship the dataset once and
move only a batch of int32 indices per step — the standard
device-resident input pipeline used by MLPerf-class TPU training.

Batches are gathered by a tiny jitted program whose output is sharded
over the ``data`` mesh axis, so the downstream train step sees exactly
the same sharded pytrees as the host loader path (``parallel/mesh.py``).
Epoch semantics match ``DataLoader``: a fresh host-side permutation per
epoch, cycling forever.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    replicated_sharding,
)


def materialize(dataset) -> tuple:
    """Stack a map-style dataset's examples into batch-axis numpy arrays.

    Returns a tuple of arrays (one per example field); scalar/1-field
    datasets produce a 1-tuple.
    """
    first = dataset[0]
    n = len(dataset)
    if not isinstance(first, (tuple, list)):
        out = np.stack([np.asarray(dataset[i]) for i in range(n)])
        return (out,)
    fields = len(first)
    cols = [[] for _ in range(fields)]
    for i in range(n):
        ex = dataset[i]
        for k in range(fields):
            cols[k].append(np.asarray(ex[k]))
    return tuple(np.stack(c) for c in cols)


def pool_nbytes(dataset) -> int:
    """Estimated HBM footprint of ``materialize(dataset)``."""
    first = dataset[0]
    fields = first if isinstance(first, (tuple, list)) else (first,)
    per = sum(np.asarray(f).nbytes for f in fields)
    return per * len(dataset)


class DevicePool:
    """A dataset resident in HBM, gathered by index.

    ``arrays`` is a pytree (tuple/dict) of equal-leading-dim numpy
    arrays. The pool is replicated on the mesh (each device holds a full
    copy — pools here are hundreds of MB, far below HBM); ``batch(idx)``
    runs a jitted on-device gather whose output is sharded over the
    ``data`` axis, costing one int32-index transfer instead of a full
    image-batch transfer per step.
    """

    def __init__(self, mesh, arrays: Any):
        self.mesh = mesh
        self.n = len(jax.tree_util.tree_leaves(arrays)[0])
        repl = replicated_sharding(mesh)
        self.arrays = jax.tree_util.tree_map(
            lambda a: jax.device_put(np.ascontiguousarray(a), repl), arrays
        )
        out = batch_sharding(mesh, DATA_AXIS)

        def gather(pool, idx):
            return jax.tree_util.tree_map(
                lambda a: jnp.take(a, idx, axis=0), pool
            )

        self._gather = jax.jit(gather, out_shardings=out)

    def batch(self, idx: np.ndarray):
        return self._gather(self.arrays, jnp.asarray(idx, jnp.int32))


class IndexSampler:
    """Epoch-permutation index stream (DataLoader shuffle semantics)."""

    def __init__(self, n: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True):
        if batch_size > n:
            raise ValueError(f"batch_size {batch_size} > dataset size {n}")
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def epochs(self):
        while True:
            order = (
                self._rng.permutation(self.n)
                if self.shuffle
                else np.arange(self.n)
            )
            stop = (
                self.n - self.batch_size + 1
                if self.drop_last
                else self.n
            )
            for start in range(0, max(stop, 1), self.batch_size):
                yield order[start : start + self.batch_size]


def device_batches(mesh, pools: dict[str, tuple[DevicePool, Any]],
                   batch_size: int, seed: int = 0):
    """Yield merged device-resident batches forever.

    ``pools`` maps a group name to ``(DevicePool, spec)`` where spec
    describes how the pool's gathered pytree contributes to the yielded
    batch: a dict spec ``{key: field_index}`` merges tuple fields into a
    dict batch; ``None`` yields the gathered pytree itself (single-group
    case). Each group has an independent index stream (matching the
    reference's independent train/reference iterators,
    ``train_sheep_localizer.py:113-116``).
    """
    streams = {
        name: IndexSampler(pool.n, batch_size, seed=seed + j)
        .epochs()
        for j, (name, (pool, _)) in enumerate(pools.items())
    }
    while True:
        merged = None
        for name, (pool, spec) in pools.items():
            gathered = pool.batch(next(streams[name]))
            if spec is None:
                merged = gathered
            else:
                if merged is None:
                    merged = {}
                for key, field in spec.items():
                    merged[key] = gathered[field]
        yield merged


def device_chunk_batches(
    mesh,
    groups: dict[str, Any],
    batch_size: int,
    steps_per_call: int,
    seed: int = 0,
    refresh: dict[str, tuple[Any, int]] | None = None,
):
    """Yield ``{'pools', 'idx'}`` chunks for ``make_pooled_train_step``.

    ``groups`` maps a group name to a pytree of host arrays with a
    common leading (dataset) dimension. Pools are uploaded once,
    replicated on the mesh; each yielded chunk carries a fresh
    ``(steps_per_call, batch_size)`` int32 index array per group,
    sharded over the ``data`` axis on its batch dimension so the
    on-device gather produces data-parallel batches. Host->device
    traffic per K training iterations = the index arrays only.

    ``refresh`` optionally maps a group name to ``(factory, every)``:
    every ``every`` chunks a background thread calls
    ``factory(generation:int) -> host pytree`` and the group's pool is
    swapped in once ready (training never blocks on generation). This
    turns a fixed pool into an unbounded data stream — the cure for a
    model memorizing a small pool (round-2 assessor finding). The new
    pool must keep the leading dimension.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = replicated_sharding(mesh)

    def upload(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(np.ascontiguousarray(a), repl), tree
        )

    pools = {g: upload(tree) for g, tree in groups.items()}
    sizes = {
        g: len(jax.tree_util.tree_leaves(tree)[0])
        for g, tree in groups.items()
    }
    idx_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    seeds = {g: seed + j for j, g in enumerate(groups)}
    samplers = {
        g: IndexSampler(sizes[g], batch_size, seed=seeds[g]).epochs()
        for g in groups
    }

    executor = None
    futures: dict[str, Any] = {}
    generation: dict[str, int] = {g: 0 for g in groups}
    if refresh:
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=1)

    chunk_i = 0
    while True:
        if refresh:
            for g, (factory, every) in refresh.items():
                if g in futures and futures[g].done():
                    tree = futures.pop(g).result()
                    pools[g] = upload(tree)
                    sizes[g] = len(jax.tree_util.tree_leaves(tree)[0])
                    generation[g] += 1
                    samplers[g] = IndexSampler(
                        sizes[g], batch_size,
                        seed=seeds[g] + 7919 * generation[g],
                    ).epochs()
                elif (
                    g not in futures
                    and every > 0
                    and chunk_i > 0
                    and chunk_i % every == 0
                ):
                    futures[g] = executor.submit(
                        factory, generation[g] + 1
                    )
        idx = {
            g: jax.device_put(
                np.stack(
                    [next(samplers[g]) for _ in range(steps_per_call)]
                ).astype(np.int32),
                idx_sharding,
            )
            for g in groups
        }
        chunk_i += 1
        yield {"pools": pools, "idx": idx}


def device_eval_batches(mesh, dataset, batch_size: int) -> list:
    """Pre-upload an eval set as a list of (device images, host gt, ...)
    batches — the images stay in HBM across every eval sweep, the ragged
    gt matching stays on host (``evaluation/intraining.py``)."""
    fields = materialize(dataset)
    n = (len(fields[0]) // batch_size) * batch_size
    # batch-shard when divisible; otherwise replicate (eval batches can
    # be smaller than the mesh, e.g. tiny smoke runs on 8 CPU devices)
    if batch_size % mesh.devices.size == 0:
        shard = batch_sharding(mesh, DATA_AXIS)
    else:
        shard = replicated_sharding(mesh)
    batches = []
    for start in range(0, n, batch_size):
        sl = slice(start, start + batch_size)
        images = jax.device_put(fields[0][sl], shard)
        rest = tuple(f[sl] for f in fields[1:])
        batches.append((images,) + rest)
    return batches
