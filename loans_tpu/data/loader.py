"""Batch loading + host->device prefetch.

Re-design of the reference's iterator stack (chainer
``MultithreadIterator``, ``train_sheep_localizer.py:113-116``, and the
custom shared-memory ``ThreadIterator``,
``schaaaafrichter/iterators/thread_iterator.py``): a thread-pool batch
assembler with bounded lookahead and order-preserving delivery, plus a
device-prefetch generator that keeps the next sharded batch in flight
(``jax.device_put`` is async) so host input work overlaps TPU compute —
the TPU-native equivalent of the reference's prefetch+pinned-buffer
machinery.
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Any, Callable, Iterator

import numpy as np


def default_collate(examples: list[Any]) -> Any:
    """Stack a list of examples (arrays or tuples of arrays) into a batch.

    Equivalent to chainer's ``concat_examples`` for the fixed-size data
    used here (``train_utils/train_utils.py:243-251`` handles padding for
    ragged data; synthetic/resized data is always fixed-size).
    """
    first = examples[0]
    if isinstance(first, (tuple, list)):
        return tuple(
            default_collate([ex[k] for ex in examples])
            for k in range(len(first))
        )
    if isinstance(first, dict):
        return {k: default_collate([ex[k] for ex in examples]) for k in first}
    return np.stack([np.asarray(ex) for ex in examples], axis=0)


def padded_collate(examples: list[Any], padding: float = 0.0) -> Any:
    """Collate ragged examples by zero-padding to the per-field max
    shape (chainer ``concat_and_pad_examples``,
    ``train_utils/train_utils.py:243-251``) — e.g. variable numbers of
    gt boxes per image. Padded gt rows are all-``padding`` and filtered
    by the evaluators' zero-row masks.
    """
    first = examples[0]
    if isinstance(first, (tuple, list)):
        return tuple(
            padded_collate([ex[k] for ex in examples], padding)
            for k in range(len(first))
        )
    if isinstance(first, dict):
        return {
            k: padded_collate([ex[k] for ex in examples], padding)
            for k in first
        }
    arrays = [np.asarray(ex) for ex in examples]
    shapes = np.array([a.shape for a in arrays])
    if (shapes == shapes[0]).all():
        return np.stack(arrays, axis=0)
    target = shapes.max(axis=0)
    out = np.full(
        (len(arrays), *target), padding, dtype=arrays[0].dtype
    )
    for i, a in enumerate(arrays):
        out[(i,) + tuple(slice(0, s) for s in a.shape)] = a
    return out


class DataLoader:
    """Thread-pooled, order-preserving batch loader.

    Iterating yields numpy batch pytrees for one epoch. ``repeat=True``
    cycles forever (chainer iterator semantics). Epoch boundaries reshuffle
    with a per-epoch PRNG derived from ``seed``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        repeat: bool = False,
        drop_last: bool = True,
        num_workers: int | None = None,
        n_prefetch: int = 2,
        seed: int = 0,
        collate: Callable = default_collate,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.repeat = repeat
        self.drop_last = drop_last
        self.num_workers = num_workers or min(8, os.cpu_count() or 1)
        self.n_prefetch = n_prefetch
        self.seed = seed
        self.collate = collate
        self.epoch = 0

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            return rng.permutation(n)
        return np.arange(n)

    def _batches_of_indices(self) -> Iterator[np.ndarray]:
        while True:
            order = self._epoch_order()
            n = len(order)
            stop = n - self.batch_size + 1 if self.drop_last else n
            for start in range(0, max(stop, 0), self.batch_size):
                yield order[start : start + self.batch_size]
            self.epoch += 1
            if not self.repeat:
                return

    def __iter__(self) -> Iterator[Any]:
        def assemble(indices):
            return self.collate(
                [self.dataset.get_example(int(i)) for i in indices]
            )

        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = []
            index_iter = self._batches_of_indices()
            try:
                for _ in range(self.n_prefetch):
                    pending.append(pool.submit(assemble, next(index_iter)))
            except StopIteration:
                pass
            while pending:
                fut = pending.pop(0)
                try:
                    pending.append(pool.submit(assemble, next(index_iter)))
                except StopIteration:
                    pass
                yield fut.result()

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)


def device_prefetch(
    iterator: Iterator[Any],
    put: Callable[[Any], Any],
    size: int = 2,
) -> Iterator[Any]:
    """Keep ``size`` batches in flight on device.

    ``put`` is typically ``lambda b: shard_batch(mesh, b)``;
    ``jax.device_put`` returns immediately, so the next transfer overlaps
    the current step.
    """
    queue: Queue = Queue(maxsize=size)
    sentinel = object()
    error: list[BaseException] = []

    def producer():
        try:
            for item in iterator:
                queue.put(put(item))
        except BaseException as e:  # re-raised on the consumer side
            error.append(e)
        finally:
            queue.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = queue.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
