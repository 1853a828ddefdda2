"""On-device SSD augmentation + encoding (data/ssd_device.py):
encode parity with the host MultiboxCoder, augmentation invariants,
and the box-follows-pixels property."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from loans_tpu.models.ssd import SSD300
from loans_tpu.data.ssd_device import (
    encode_batch,
    pairwise_iou_yxyx,
    ssd_augment_batch,
)


@pytest.fixture(scope="module")
def coder():
    return SSD300(n_fg_class=1).coder()


def test_encode_matches_host_coder(coder):
    rng = np.random.default_rng(0)
    d_cychw = jnp.asarray(coder.default_bbox)
    d_yxyx = jnp.asarray(coder.default_yxyx)
    for trial in range(4):
        r = 3
        y0 = rng.uniform(0, 0.7, r)
        x0 = rng.uniform(0, 0.7, r)
        boxes = np.stack(
            [y0, x0, y0 + rng.uniform(0.05, 0.3, r),
             x0 + rng.uniform(0.05, 0.3, r)], axis=1
        ).astype(np.float32)
        n_valid = trial % (r + 1)
        valid = np.arange(r) < n_valid
        labels = np.zeros(r, np.int32)

        want_loc, want_conf = coder.encode(boxes[:n_valid], labels[:n_valid])
        got_loc, got_conf = encode_batch(
            d_cychw, d_yxyx, jnp.asarray(boxes)[None],
            jnp.asarray(valid)[None],
        )
        np.testing.assert_array_equal(np.asarray(got_conf[0]), want_conf)
        np.testing.assert_allclose(
            np.asarray(got_loc[0]), want_loc, atol=1e-5
        )


def test_pairwise_iou_matches_numpy():
    from loans_tpu.evaluation.voc import _bbox_iou

    rng = np.random.default_rng(1)
    a = np.sort(rng.uniform(0, 1, (5, 4)).astype(np.float32), axis=-1)[
        :, [0, 1, 2, 3]
    ]
    a = np.stack([a[:, 0], a[:, 1], a[:, 2], a[:, 3]], axis=1)
    b = np.sort(rng.uniform(0, 1, (4, 4)).astype(np.float32), axis=-1)
    # make well-formed boxes (y0<y1, x0<x1)
    a = np.stack([a[:, 0], a[:, 1], a[:, 0] + a[:, 2], a[:, 1] + a[:, 3]], 1)
    b = np.stack([b[:, 0], b[:, 1], b[:, 0] + b[:, 2], b[:, 1] + b[:, 3]], 1)
    got = np.asarray(pairwise_iou_yxyx(jnp.asarray(a), jnp.asarray(b)))
    want = _bbox_iou(a.astype(np.float64), b.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_augment_box_follows_pixels():
    """Bright stamp on black scene: after augmentation every kept gt box
    must still cover bright pixels (box transform consistent with the
    sampled image content)."""
    n, s, out = 8, 64, 48
    scenes = np.zeros((n, s, s, 3), np.float32)
    boxes = np.zeros((n, 1, 4), np.float32)
    rng = np.random.default_rng(2)
    for i in range(n):
        y, x = rng.integers(8, 40, 2)
        h, w = rng.integers(10, 20, 2)
        scenes[i, y : y + h, x : x + w] = 1.0
        boxes[i, 0] = (y, x, y + h, x + w)

    images, boxes_out, valid_out = jax.jit(
        lambda k, sc, b, v: ssd_augment_batch(k, sc, b, v, out)
    )(
        jax.random.key(3),
        jnp.asarray(scenes),
        jnp.asarray(boxes),
        jnp.ones((n, 1), bool),
    )
    images, boxes_out, valid_out = map(
        np.asarray, (images, boxes_out, valid_out)
    )
    assert images.shape == (n, out, out, 3)
    assert valid_out.any(), "all boxes dropped — wildly unlikely"
    for i in range(n):
        if not valid_out[i, 0]:
            continue
        y0, x0, y1, x1 = boxes_out[i, 0]
        assert 0 <= y0 <= y1 <= out and 0 <= x0 <= x1 <= out
        ys, xs = slice(int(y0), max(int(y1), int(y0) + 1)), slice(
            int(x0), max(int(x1), int(x0) + 1)
        )
        inside = images[i, ys, xs].mean()
        overall = images[i].mean()
        assert inside > overall, (
            f"sample {i}: box does not cover the bright stamp "
            f"(inside {inside:.3f} vs overall {overall:.3f})"
        )
        # alignment: the transformed box must land on the rendered
        # bright-pixel extent to ~1.5 px (catches renderer/box-map
        # convention mismatches like out/(w) vs (out-1)/(w-1))
        bright = images[i].mean(axis=-1) > 0.5
        if bright.any() and y1 - y0 > 4 and x1 - x0 > 4:
            yy, xx = np.where(bright)
            # only check edges that are strictly inside the frame
            # (clipped edges legitimately cut the stamp)
            if y0 > 1:
                assert abs(yy.min() - y0) <= 1.5, (i, yy.min(), y0)
            if x0 > 1:
                assert abs(xx.min() - x0) <= 1.5, (i, xx.min(), x0)
            if y1 < out - 1:
                assert abs(yy.max() + 1 - y1) <= 1.5, (i, yy.max(), y1)
            if x1 < out - 1:
                assert abs(xx.max() + 1 - x1) <= 1.5, (i, xx.max(), x1)


@pytest.mark.slow
def test_ssd_train_step_on_8_device_mesh():
    """The SSD train step over the 8-device data-parallel mesh —
    multi-chip correctness of the second training pipeline is checked,
    not inferred from shared machinery (the TPU-native stand-in for
    ``schaaaafrichter/train.py:189-191``'s MultiprocessParallelUpdater).

    The full pooled body (augment+encode+model) at SSD300 size makes the
    CPU SPMD compile blow past an hour on this box, so multi-device
    coverage is split: this test runs the real SSD300 model + multibox
    loss + optimizer update on a sharded pre-encoded batch, and
    ``test_ssd_augment_encode_on_8_device_mesh`` runs the on-device
    augment+encode data path on the same mesh.
    """
    from loans_tpu.parallel import create_mesh, replicate, shard_batch
    from loans_tpu.train import create_train_state
    from loans_tpu.train.ssd_steps import (
        make_ssd_train_step,
        ssd_optimizer,
    )

    mesh = create_mesh()
    assert len(mesh.devices.flat) == 8
    model = SSD300(n_fg_class=1)
    coder = model.coder()
    size = model.input_size
    state = create_train_state(
        model,
        jax.random.key(0),
        jnp.zeros((1, size, size, 3)),
        ssd_optimizer(1e-4),
        train=False,
    )
    state = replicate(mesh, state)

    rng = np.random.default_rng(5)
    images = rng.uniform(size=(8, size, size, 3)).astype(np.float32)
    loc, conf = coder.encode(
        np.array([[0.2, 0.2, 0.8, 0.8]], np.float32), np.zeros(1)
    )
    batch = shard_batch(
        mesh,
        (
            images,
            np.tile(loc[None], (8, 1, 1)).astype(np.float32),
            np.tile(conf[None], (8, 1)),
        ),
    )
    step = make_ssd_train_step(model)
    state2, _, metrics = step(state, None, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss/loc"]))
    # updated params must still be replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_ssd_augment_encode_on_8_device_mesh():
    """The on-device SSD augment + multibox encode (the data path of
    ``ssd_pooled_body``) jitted over the 8-device mesh with the batch
    sharded on the data axis: per-device augmentation draws must match
    the single-device result for the same keys, and the encoded targets
    must come out sharded the same way they went in.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from loans_tpu.data.ssd_device import encode_batch, ssd_augment_batch
    from loans_tpu.parallel import create_mesh, shard_batch

    mesh = create_mesh()
    coder = SSD300(n_fg_class=1).coder()
    default_cychw = jnp.asarray(coder.default_bbox)
    default_yxyx = jnp.asarray(coder.default_yxyx)
    out = 64  # augment window size; independent of the SSD input size

    n = 8
    rng = np.random.default_rng(7)
    scenes = rng.uniform(size=(n, 128, 128, 3)).astype(np.float32)
    boxes = np.tile(np.array([20, 20, 100, 100], np.float32), (n, 1, 1))
    valid = np.ones((n, 1), bool)

    def data_path(key, scenes, boxes, valid):
        imgs, bx, vd = ssd_augment_batch(key, scenes, boxes, valid, out)
        gt_loc, gt_conf = encode_batch(
            default_cychw, default_yxyx, bx / out, vd,
            jnp.zeros(vd.shape, jnp.int32),
        )
        return imgs, gt_loc, gt_conf

    key = jax.random.key(3)
    ref = jax.jit(data_path)(key, scenes, boxes, valid)

    sharded = shard_batch(mesh, (scenes, boxes, valid))
    got = jax.jit(data_path)(key, *sharded)
    # partitioned resampling reassociates float sums (~1e-5 on pixels);
    # the augmentation DRAWS (crop windows, flips) must agree exactly,
    # which 1e-3 distinguishes from a flipped discrete choice
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), atol=1e-3)
    assert not got[1].sharding.is_fully_replicated  # stayed data-sharded


def test_augment_deterministic_per_key():
    n, s, out = 2, 32, 24
    rng = np.random.default_rng(4)
    scenes = jnp.asarray(rng.uniform(size=(n, s, s, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.tile(np.array([4, 4, 20, 20], np.float32), (n, 1, 1))
    )
    valid = jnp.ones((n, 1), bool)
    a = ssd_augment_batch(jax.random.key(0), scenes, boxes, valid, out)
    b = ssd_augment_batch(jax.random.key(0), scenes, boxes, valid, out)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    c = ssd_augment_batch(jax.random.key(1), scenes, boxes, valid, out)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))
