"""Device-resident dataset pools (data/device_data.py) on the 8-device mesh."""

import numpy as np
import pytest

from loans_tpu.data.device_data import (
    DevicePool,
    IndexSampler,
    device_batches,
    device_eval_batches,
    materialize,
    pool_nbytes,
)
from loans_tpu.parallel import create_mesh


class TupleDataset:
    def __init__(self, n):
        self.imgs = np.arange(n * 4 * 4 * 3, dtype=np.uint8).reshape(
            n, 4, 4, 3
        )
        self.labels = np.linspace(0, 1, n, dtype=np.float32)[:, None]

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return self.imgs[i], self.labels[i]


def test_materialize_and_nbytes():
    ds = TupleDataset(10)
    fields = materialize(ds)
    assert len(fields) == 2
    np.testing.assert_array_equal(fields[0], ds.imgs)
    np.testing.assert_array_equal(fields[1], ds.labels)
    assert pool_nbytes(ds) == 10 * (4 * 4 * 3 + 4)


def test_pool_gather_matches_dataset():
    mesh = create_mesh()
    ds = TupleDataset(16)
    pool = DevicePool(mesh, materialize(ds))
    idx = np.array([3, 0, 15, 7, 1, 2, 9, 8])
    imgs, labels = pool.batch(idx)
    np.testing.assert_array_equal(np.asarray(imgs), ds.imgs[idx])
    np.testing.assert_array_equal(np.asarray(labels), ds.labels[idx])
    # output is sharded over the data axis
    assert len(imgs.sharding.device_set) == mesh.devices.size


def test_index_sampler_epoch_coverage():
    s = IndexSampler(12, 4, seed=0)
    it = s.epochs()
    epoch = np.concatenate([next(it) for _ in range(3)])
    assert sorted(epoch.tolist()) == list(range(12))
    epoch2 = np.concatenate([next(it) for _ in range(3)])
    assert sorted(epoch2.tolist()) == list(range(12))
    assert not np.array_equal(epoch, epoch2)  # reshuffled


def test_device_batches_merged_dict():
    mesh = create_mesh()
    train = TupleDataset(16)
    ref = TupleDataset(24)
    pools = {
        "unlabeled": (DevicePool(mesh, materialize(train)[:1]),
                      {"unlabeled": 0}),
        "reference": (DevicePool(mesh, materialize(ref)),
                      {"real": 0, "labels": 1}),
    }
    it = device_batches(mesh, pools, batch_size=8, seed=0)
    b = next(it)
    assert set(b) == {"unlabeled", "real", "labels"}
    assert b["unlabeled"].shape == (8, 4, 4, 3)
    assert b["real"].shape == (8, 4, 4, 3)
    assert b["labels"].shape == (8, 1)
    # independent streams: values come from the right pools
    rows = np.asarray(b["real"]).reshape(8, -1)[:, 0]
    assert all(
        any((ref.imgs[j].reshape(-1)[0] == r) for j in range(24))
        for r in rows
    )


def test_device_batches_single_tuple_pool():
    mesh = create_mesh()
    ds = TupleDataset(16)
    pools = {"train": (DevicePool(mesh, materialize(ds)), None)}
    it = device_batches(mesh, pools, batch_size=8, seed=0)
    b = next(it)
    assert isinstance(b, tuple) and len(b) == 2
    assert b[0].shape == (8, 4, 4, 3)


def test_device_eval_batches():
    mesh = create_mesh()
    ds = TupleDataset(20)
    batches = device_eval_batches(mesh, ds, batch_size=8)
    assert len(batches) == 2  # 20 // 8
    imgs, labels = batches[0]
    np.testing.assert_array_equal(np.asarray(imgs), ds.imgs[:8])
    assert isinstance(labels, np.ndarray)


def test_sampler_rejects_oversized_batch():
    with pytest.raises(ValueError):
        IndexSampler(4, 8)


def test_device_chunk_batches_refresh():
    """Background pool refresh swaps group content without blocking."""
    import time

    from loans_tpu.data.device_data import device_chunk_batches

    mesh = create_mesh()
    base = {"real": np.zeros((16, 2, 2, 3), np.float32)}
    calls = []

    def factory(generation):
        calls.append(generation)
        return {
            "real": np.full((16, 2, 2, 3), float(generation), np.float32)
        }

    it = device_chunk_batches(
        mesh, {"reference": base}, batch_size=8, steps_per_call=2,
        refresh={"reference": (factory, 2)},
    )
    first = next(it)
    assert float(np.asarray(
        first["pools"]["reference"]["real"]
    ).max()) == 0.0
    # chunk 2 schedules the regen; poll until the swap lands
    val = 0.0
    for _ in range(50):
        chunk = next(it)
        val = float(np.asarray(
            chunk["pools"]["reference"]["real"]
        ).max())
        if val > 0:
            break
        time.sleep(0.05)
    assert val == 1.0
    assert calls == [1] or calls[0] == 1
