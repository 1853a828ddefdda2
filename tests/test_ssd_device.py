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
