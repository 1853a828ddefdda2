"""Data pipeline tests: synthetic compositor IoU labels, dataset formats,
loader ordering/shapes."""

import os

import numpy as np
import pytest
from PIL import Image

from loans_tpu.data import (
    DataLoader,
    DiscriminatorImageDataset,
    ImageDataset,
    LabeledImageDataset,
    PasteAndCropGenerator,
    SyntheticAssessorDataset,
    SyntheticLocalizerDataset,
    device_prefetch,
    generate_dataset,
)


def test_paste_and_crop_iou_labels_are_stratified():
    gen = PasteAndCropGenerator(seed=0, image_size=(128, 128), output_size=(32, 32))
    labels = [gen.sample()[1] for _ in range(60)]
    labels = np.asarray(labels)
    assert labels.min() >= 0.0 and labels.max() <= 1.0
    # Stratification: both low- and high-IoU crops must appear.
    assert (labels < 0.4).any() and (labels > 0.7).any()


def test_scene_with_bbox_contains_stamp():
    gen = PasteAndCropGenerator(seed=1, image_size=(96, 96))
    img, bbox = gen.scene_with_bbox()
    assert img.shape == (96, 96, 3)
    y1, x1, y2, x2 = bbox
    assert 0 <= y1 < y2 <= 96 and 0 <= x1 < x2 <= 96


def test_synthetic_datasets():
    ds = SyntheticAssessorDataset(8, output_size=(16, 16), image_size=(64, 64))
    img, label = ds.get_example(0)
    assert img.shape == (16, 16, 3)
    assert label.shape == (1,)
    loc = SyntheticLocalizerDataset(4, image_size=(64, 64), labeled=True)
    img, bbox, score = loc.get_example(0)
    assert img.shape == (64, 64, 3) and bbox.shape == (1, 4)


def test_generate_dataset_and_reload(tmp_path):
    csv_path = generate_dataset(str(tmp_path), 6, image_size=(64, 64), output_size=(16, 16))
    assert os.path.exists(csv_path)
    ds = LabeledImageDataset(csv_path, image_size=(16, 16))
    assert len(ds) == 6
    img, label, score = ds.get_example(0)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.max() <= 1.0
    assert 0.0 <= float(label) <= 1.0


def test_image_dataset_augment(tmp_path):
    paths = []
    rng = np.random.default_rng(0)
    for i in range(4):
        p = str(tmp_path / f"{i}.png")
        Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(p)
        paths.append(p)
    ds = ImageDataset(paths, image_size=(32, 32), transform_probability=1.0)
    img = ds.get_example(0)
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.float32
    # no-imgaug fallback path
    ds2 = ImageDataset(
        paths, image_size=(32, 32), transform_probability=1.0, use_imgaug=False
    )
    assert ds2.get_example(1).shape == (32, 32, 3)


def test_discriminator_dataset_constant_label(tmp_path):
    p = str(tmp_path / "x.png")
    Image.fromarray(np.zeros((20, 20, 3), dtype=np.uint8)).save(p)
    ds = DiscriminatorImageDataset([p], image_size=(16, 16), label=1.0)
    img, label = ds.get_example(0)
    np.testing.assert_allclose(label, [1.0])


def test_labeled_dataset_bbox_rescale(tmp_path):
    p = str(tmp_path / "img.png")
    Image.fromarray(np.zeros((100, 200, 3), dtype=np.uint8)).save(p)
    pairs = [(p, [10.0, 20.0, 50.0, 180.0])]  # (y1, x1, y2, x2)
    ds = LabeledImageDataset(pairs, image_size=(50, 100))
    img, label, _ = ds.get_example(0)
    assert img.shape == (50, 100, 3)
    np.testing.assert_allclose(label[0], [5.0, 10.0, 25.0, 90.0])


def test_labeled_dataset_bad_label_raises(tmp_path):
    p = str(tmp_path / "img.png")
    Image.fromarray(np.zeros((50, 50, 3), dtype=np.uint8)).save(p)
    ds = LabeledImageDataset(
        [(p, [0.0, 0.0, 500.0, 500.0])], image_size=(25, 25)
    )
    with pytest.raises(ValueError):
        ds.check_for_bad_label(np.array([[0, 0, 500, 500]]), (50, 50))


def test_dataloader_batching_and_order():
    class Counting:
        def __len__(self):
            return 10

        def get_example(self, i):
            return np.full((2,), i, dtype=np.float32)

    loader = DataLoader(Counting(), batch_size=4, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    np.testing.assert_allclose(batches[0][:, 0], [0, 1, 2, 3])
    np.testing.assert_allclose(batches[1][:, 0], [4, 5, 6, 7])


def test_dataloader_repeat_and_shuffle():
    class Counting:
        def __len__(self):
            return 8

        def get_example(self, i):
            return np.asarray([i], dtype=np.float32)

    loader = DataLoader(
        Counting(), batch_size=4, shuffle=True, repeat=True, seed=3
    )
    it = iter(loader)
    seen = [tuple(np.asarray(next(it))[:, 0]) for _ in range(6)]
    assert len(seen) == 6  # cycles past epoch boundary


def test_device_prefetch_passthrough():
    items = [np.ones((2, 2)) * i for i in range(5)]
    out = list(device_prefetch(iter(items), put=lambda x: x * 2))
    assert len(out) == 5
    np.testing.assert_allclose(out[3], items[3] * 2)


def test_padded_collate_ragged_boxes():
    from loans_tpu.data import padded_collate

    ex1 = (np.zeros((4, 4, 3), np.float32), np.array([[1, 2, 3, 4]], np.float32))
    ex2 = (
        np.zeros((4, 4, 3), np.float32),
        np.array([[1, 2, 3, 4], [5, 6, 7, 8]], np.float32),
    )
    imgs, boxes = padded_collate([ex1, ex2])
    assert imgs.shape == (2, 4, 4, 3)
    assert boxes.shape == (2, 2, 4)
    assert (boxes[0, 1] == 0).all()  # padding row
    np.testing.assert_allclose(boxes[1, 1], [5, 6, 7, 8])


def test_synthetic_parallel_generation_deterministic():
    from loans_tpu.data.synthetic import SyntheticAssessorDataset

    a = SyntheticAssessorDataset(24, output_size=(8, 8), image_size=(32, 32))
    b = SyntheticAssessorDataset(24, output_size=(8, 8), image_size=(32, 32))
    for i in (0, 7, 23):
        img_a, iou_a = a.get_example(i)
        img_b, iou_b = b.get_example(i)
        np.testing.assert_allclose(img_a, img_b)
        np.testing.assert_allclose(iou_a, iou_b)


def test_box_to_theta_roundtrip():
    """box -> theta -> STN crop content equals the pixel box region."""
    import jax.numpy as jnp

    from loans_tpu.ops.geometry import Size, box_to_theta
    from loans_tpu.ops.stn import spatial_transform

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, 32, 40, 3)).astype("f")
    box = np.array([[8, 4, 24, 20]], dtype=np.float32)  # x1 y1 x2 y2
    theta = box_to_theta(box, Size(32, 40))
    crop = np.asarray(
        spatial_transform(
            jnp.asarray(img), jnp.asarray(theta), Size(16, 16),
            method="separable",
        )
    )
    # out size == box size -> the STN samples land exactly on pixels
    np.testing.assert_allclose(crop[0], img[0, 4:20, 8:24], atol=1e-5)


def test_assessor_dataset_stn_pipeline():
    from loans_tpu.data.synthetic import SyntheticAssessorDataset

    ds_pil = SyntheticAssessorDataset(
        8, output_size=(16, 16), image_size=(64, 64), seed=3,
        output_dtype="uint8",
    )
    ds_stn = SyntheticAssessorDataset(
        8, output_size=(16, 16), image_size=(64, 64), seed=3,
        output_dtype="uint8", crop_pipeline="stn",
    )
    assert len(ds_stn) == 8
    for i in range(8):
        img, iou = ds_stn.get_example(i)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        assert 0.0 <= float(iou[0]) <= 1.0
    # same seed -> same crop boxes -> same IoU labels as the PIL path
    for i in range(8):
        assert abs(
            float(ds_stn.get_example(i)[1][0])
            - float(ds_pil.get_example(i)[1][0])
        ) < 1e-6


def test_shared_asset_world():
    """Same asset_seed -> identical stamps/backgrounds across generators
    with independent sampling streams; different asset_seed -> different
    assets (the round-2 weak-supervision fix: assessor and localizer
    must see the same object family)."""
    import numpy as np
    from loans_tpu.data.synthetic import PasteAndCropGenerator

    a = PasteAndCropGenerator(seed=0, asset_seed=42, n_procedural=4)
    b = PasteAndCropGenerator(seed=1, asset_seed=42, n_procedural=4)
    c = PasteAndCropGenerator(seed=0, asset_seed=43, n_procedural=4)
    for s_a, s_b in zip(a.stamps, b.stamps):
        np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
    assert any(
        not np.array_equal(np.asarray(s_a), np.asarray(s_c))
        for s_a, s_c in zip(a.stamps, c.stamps)
    )
    # sampling streams stay independent
    crop_a, _ = a.sample()
    crop_b, _ = b.sample()
    assert not np.array_equal(crop_a, crop_b)


def test_device_augment_preserves_shape_and_range():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from loans_tpu.data.device_augment import augment_crops

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)).astype(np.float32))
    out = augment_crops(jax.random.key(0), imgs)
    assert out.shape == imgs.shape and out.dtype == imgs.dtype
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # deterministic per key, varying across keys
    out2 = augment_crops(jax.random.key(0), imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = augment_crops(jax.random.key(1), imgs)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_low_iou_crop_coverage():
    """low_iou_fraction fills the [0, 0.2) IoU range the stratified
    reference recipe never emits — assessor coverage of background."""
    import numpy as np
    from loans_tpu.data.synthetic import PasteAndCropGenerator

    gen = PasteAndCropGenerator(seed=0, low_iou_fraction=0.3)
    ious = np.asarray([gen.sample()[1] for _ in range(300)])
    # object-free crops (zero intersection) now exist...
    assert (ious == 0.0).mean() > 0.05
    # ...and stratified coverage is retained
    assert (ious > 0.5).mean() > 0.2
    assert ious.min() >= 0.0 and ious.max() <= 1.0

    # the legacy recipe never produces object-free crops (naive zoom
    # always contains the stamp; stratified crops overlap >= ~0.15)
    fixed = PasteAndCropGenerator(seed=0)
    ious_fixed = np.asarray([fixed.sample()[1] for _ in range(300)])
    assert (ious_fixed == 0.0).mean() < 0.01


def test_cached_synthetic_roundtrip(tmp_path):
    import numpy as np
    from loans_tpu.data.synthetic import (
        SyntheticAssessorDataset,
        cached_synthetic,
    )

    def build(items=None):
        return SyntheticAssessorDataset(
            8, output_size=(8, 8), image_size=(32, 32), seed=3,
            output_dtype="uint8", items=items,
        )

    cache = str(tmp_path)
    a = cached_synthetic(cache, "crops", build, n=8, seed=3)
    import os
    files = os.listdir(cache)
    assert len(files) == 1
    b = cached_synthetic(cache, "crops", build, n=8, seed=3)
    assert len(os.listdir(cache)) == 1  # hit, not regenerated
    for i in range(8):
        ia, la = a.get_example(i)
        ib, lb = b.get_example(i)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)
    # different key -> separate entry
    cached_synthetic(cache, "crops", build, n=8, seed=4)
    assert len(os.listdir(cache)) == 2


def test_hard_benchmark_world():
    """Hard mode: distractor clutter present, gt label still the target.

    The target stamp is pasted LAST (never occluded) and distractors are
    rejected near the gt box, so the (scene, bbox) label contract is
    unchanged; the scene itself must differ from the default world.
    """
    kw = dict(seed=5, image_size=(96, 96), asset_seed=11, n_procedural=8)
    easy = PasteAndCropGenerator(**kw)
    hard = PasteAndCropGenerator(hard=True, **kw)
    assert len(hard.distractors) == 8 and len(easy.distractors) == 0
    img, bbox = hard.scene_with_bbox()
    assert img.shape == (96, 96, 3)
    y1, x1, y2, x2 = bbox
    assert 0 <= y1 < y2 <= 96 and 0 <= x1 < x2 <= 96
    # hard backgrounds are high-frequency: neighbor-pixel variation far
    # above the default muted 8x8-upsampled background
    hard_bg = np.asarray(hard.backgrounds[0].convert("RGB"), np.float32)
    easy_bg = np.asarray(easy.backgrounds[0].convert("RGB"), np.float32)
    hf = lambda a: np.abs(np.diff(a, axis=0)).mean()
    assert hf(hard_bg) > 4 * hf(easy_bg)
    # datasets accept the flag
    ds = SyntheticLocalizerDataset(
        2, image_size=(64, 64), labeled=True, hard=True, asset_seed=1,
    )
    img, bbox, _ = ds.get_example(0)
    assert img.shape == (64, 64, 3)
    crops = SyntheticAssessorDataset(
        4, output_size=(16, 16), image_size=(64, 64), hard=True, asset_seed=1,
    )
    c, iou = crops.get_example(0)
    assert c.shape == (16, 16, 3) and 0 <= float(iou[0]) <= 1


def test_base_bboxes_sizes(tmp_path):
    """--base-bboxes: stamps resized to the real gt size distribution
    scaled by the background->image resize factors
    (paste_and_crop_sheep.py:111,157-175)."""
    import json

    from loans_tpu.data.synthetic import load_base_bbox_sizes

    path = tmp_path / "info.json"
    data = [
        {"image": "a.png", "bounding_boxes": [[10, 20, 74, 52], [0, 0, 0, 5]]},
        {"image": "b.png", "bounding_boxes": [[5, 5, 37, 69]]},
    ]
    path.write_text(json.dumps(data))
    sizes = load_base_bbox_sizes(str(path))
    # (w, h); the degenerate zero-height box is dropped
    assert sizes == [(32, 64), (64, 32)]

    gen = PasteAndCropGenerator(
        seed=0, image_size=(128, 128), base_bboxes=sizes
    )
    # backgrounds are 256x256 -> factor 0.5: pasted boxes must be one of
    # the real sizes scaled by 0.5
    want = {(16, 32), (32, 16)}
    for _ in range(6):
        scene = gen.paste()
        x1, y1, x2, y2 = scene.paste_bbox
        assert (x2 - x1, y2 - y1) in want


def test_base_bboxes_empty_raises(tmp_path):
    import json

    from loans_tpu.data.synthetic import load_base_bbox_sizes

    path = tmp_path / "empty.json"
    path.write_text(json.dumps([{"image": "a", "bounding_boxes": []}]))
    with pytest.raises(ValueError):
        load_base_bbox_sizes(str(path))
