"""Native C++ host ops: build + correctness vs numpy/python references."""

import numpy as np
import pytest

from loans_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable (no g++)")
    return lib


def test_nms_matches_python(lib):
    from loans_tpu.evaluation.metrics import _nms_python

    rng = np.random.default_rng(0)
    for _ in range(10):
        yx = rng.uniform(0, 80, size=(30, 2))
        wh = rng.uniform(4, 40, size=(30, 2))
        boxes = np.concatenate([yx, yx + wh], axis=1).astype(np.float32)
        scores = rng.uniform(size=30)
        a = native.nms(boxes, 0.4, score=scores)
        b = _nms_python(boxes, 0.4, score=scores)
        np.testing.assert_array_equal(a, b)


def test_nms_empty(lib):
    assert native.nms(np.zeros((0, 4), np.float32), 0.5).size == 0


def test_resize_bilinear_close_to_cv2(lib):
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    ours = native.resize_bilinear(img, (64, 48))
    ref = cv2.resize(img, (48, 64), interpolation=cv2.INTER_LINEAR)
    # same convention; allow 1-LSB rounding differences
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_composite_rgba(lib):
    canvas = np.zeros((10, 10, 3), dtype=np.uint8)
    stamp = np.zeros((4, 4, 4), dtype=np.uint8)
    stamp[..., 0] = 200  # red
    stamp[..., 3] = 255  # opaque
    native.composite_rgba(canvas, stamp, 2, 3)
    assert canvas[3, 4, 0] == 200 and canvas[3, 4, 1] == 0
    assert canvas[0, 0, 0] == 0  # outside stamp untouched
    # clipping: negative offsets must not crash
    native.composite_rgba(canvas, stamp, -2, -2)
    assert canvas[1, 1, 0] == 200


def test_u8_to_f32(lib):
    src = np.arange(256, dtype=np.uint8).reshape(16, 16)
    out = native.u8_to_f32(src)
    np.testing.assert_allclose(out, src.astype(np.float32) / 255.0)


def test_iou_crop_search(lib):
    paste = np.array([40, 40, 80, 80], dtype=np.float32)
    res = native.iou_crop_search(
        paste, target=0.5, tol=0.02, img_hw=(128, 128), crop_hw=(40, 40),
        seed=7,
    )
    assert res is not None
    y, x = res
    crop = np.array([y, x, y + 40, x + 40], dtype=np.float32)
    yy1, xx1 = max(crop[0], paste[0]), max(crop[1], paste[1])
    yy2, xx2 = min(crop[2], paste[2]), min(crop[3], paste[3])
    inter = max(yy2 - yy1, 0) * max(xx2 - xx1, 0)
    uni = 1600 + 1600 - inter
    assert abs(inter / uni - 0.5) <= 0.02
    # impossible target -> None
    assert (
        native.iou_crop_search(
            paste, 0.99, 0.001, (128, 128), (10, 10), max_trials=1000
        )
        is None
    )
