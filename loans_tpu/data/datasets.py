"""Dataset readers matching the reference's on-disk formats.

Formats (``common/datasets/image_dataset.py``):
  * unlabeled list: text file with one image path per line, or a list of
    paths (``train_sheep_localizer.py:24-32`` reads csv with one column);
  * labeled csv: tab-separated ``path\tlabel...`` rows (IoU scalar for
    assessor data, 4k values for bbox data);
  * labeled json: list of {"image": path, "bounding_boxes": [[y1,x1,y2,x2],..]}
    (schaaaafrichter format, also accepted by LabeledImageDataset).

TPU-first changes: images are returned HWC float32 in [0, 1] (NHWC
batches), never CHW; datasets take an explicit seed; augmentation is the
native pipeline in ``augment.py``.
"""

from __future__ import annotations

import csv
import json
import os
from typing import Sequence

import numpy as np
from PIL import Image

from loans_tpu.data import augment


def resize_image(
    image: np.ndarray, image_size, image_mode: str = "RGB"
) -> np.ndarray:
    """LANCZOS resize, HWC uint8/float in -> HWC float32 out
    (``image_dataset.py:16-28`` semantics, HWC layout).

    ``image_size`` is (height, width)."""
    pil = Image.fromarray(image.astype("uint8")).convert(image_mode)
    pil = pil.resize((image_size[1], image_size[0]), Image.LANCZOS)
    arr = np.asarray(pil).astype(np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def resize_bbox(bbox: np.ndarray, in_size, out_size) -> np.ndarray:
    """Scale (y1, x1, y2, x2) boxes between image sizes (chainercv
    ``transforms.resize_bbox`` semantics)."""
    y_scale = out_size[0] / in_size[0]
    x_scale = out_size[1] / in_size[1]
    out = bbox.astype(np.float32).copy()
    out[:, 0] *= y_scale
    out[:, 2] *= y_scale
    out[:, 1] *= x_scale
    out[:, 3] *= x_scale
    return out


def load_image(path: str, image_mode: str = "RGB") -> np.ndarray:
    """Load to HWC uint8."""
    with Image.open(path) as img:
        arr = np.asarray(img.convert(image_mode))
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


def read_path_list(path: str) -> list[str]:
    """One path per line (or first csv column), relative to the file."""
    root = os.path.dirname(os.path.abspath(path))
    paths = []
    with open(path) as handle:
        for row in csv.reader(handle, delimiter="\t"):
            if not row:
                continue
            p = row[0]
            paths.append(p if os.path.isabs(p) else os.path.join(root, p))
    return paths


def read_labeled_csv(path: str) -> list[tuple[str, list[float]]]:
    """Tab-separated ``path\tlabel...`` (``image_dataset.py:104-110``)."""
    root = os.path.dirname(os.path.abspath(path))
    pairs = []
    with open(path) as handle:
        for row in csv.reader(handle, delimiter="\t"):
            if not row:
                continue
            p = row[0]
            p = p if os.path.isabs(p) else os.path.join(root, p)
            pairs.append((p, [float(v) for v in row[1:]]))
    return pairs


def read_bbox_json(path: str) -> list[tuple[str, list[float]]]:
    """schaaaafrichter gt json: {"image", "bounding_boxes"} records."""
    root = os.path.dirname(os.path.abspath(path))
    with open(path) as handle:
        data = json.load(handle)
    pairs = []
    for item in data:
        p = item["image"]
        p = p if os.path.isabs(p) else os.path.join(root, p)
        flat = [float(v) for box in item["bounding_boxes"] for v in box]
        pairs.append((p, flat))
    return pairs


class ImageDataset:
    """Unlabeled image stream (``image_dataset.py:47-98``).

    Returns HWC float32 images in [0, 1] (or raw uint8 with
    ``output_dtype='uint8'`` — 4x cheaper host->device transfer; the
    jitted steps normalize on device).
    """

    def __init__(
        self,
        paths: Sequence[str] | str,
        image_size=None,
        image_mode: str = "RGB",
        transform_probability: float = 0.0,
        use_imgaug: bool = True,
        min_crop_ratio: float = 0.6,
        max_crop_ratio: float = 0.9,
        crop_always: bool = False,
        seed: int = 0,
        output_dtype: str = "float32",
    ):
        self.output_dtype = output_dtype
        if isinstance(paths, str):
            paths = read_path_list(paths)
        self.paths = list(paths)
        self.image_size = image_size
        self.image_mode = image_mode
        self.transform_probability = transform_probability
        self.use_imgaug = use_imgaug
        self.min_crop_ratio = min_crop_ratio
        self.max_crop_ratio = max_crop_ratio
        self.crop_always = crop_always
        self.pipeline = (
            augment.unlabeled_pipeline(transform_probability)
            if transform_probability > 0 and use_imgaug
            else None
        )
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def _load(self, i: int) -> np.ndarray:
        img = load_image(self.paths[i], "RGB")
        if img.shape[-1] == 1:
            img = np.tile(img, (1, 1, 3))
        return img

    def get_example(self, i: int) -> np.ndarray:
        img = self._load(i)
        if self.pipeline is not None:
            img = self.pipeline(img, self._rng)
        elif self.transform_probability > 0:
            img = augment.random_crop_flip(
                img,
                self._rng,
                self.transform_probability,
                self.min_crop_ratio,
                self.max_crop_ratio,
                self.crop_always,
            )
        if self.image_size is not None:
            img = resize_image(img, self.image_size, self.image_mode)
        if self.output_dtype == "uint8":
            return np.ascontiguousarray(np.clip(img, 0, 255), dtype=np.uint8)
        return np.ascontiguousarray(img, dtype=np.float32) / 255.0

    def __getitem__(self, i):
        return self.get_example(i)


class LabeledImageDataset:
    """Images + labels (``image_dataset.py:101-182``).

    Labels with 4k entries are reshaped to (k, 4) bboxes and rescaled
    with the image; scalar labels (IoU targets) pass through. Returns
    (image, label, dummy_score) like the reference when
    ``return_dummy_scores``.
    """

    def __init__(
        self,
        pairs,
        image_size=None,
        image_mode: str = "RGB",
        transform_probability: float = 0.0,
        label_dtype=np.float32,
        return_dummy_scores: bool = True,
        seed: int = 0,
        output_dtype: str = "float32",
    ):
        self.output_dtype = output_dtype
        if isinstance(pairs, str):
            if pairs.endswith(".json"):
                pairs = read_bbox_json(pairs)
            else:
                pairs = read_labeled_csv(pairs)
        self.pairs = list(pairs)
        self.image_size = image_size
        self.image_mode = image_mode
        self.label_dtype = label_dtype
        self.return_dummy_scores = return_dummy_scores
        self.pipeline = (
            augment.labeled_pipeline(transform_probability)
            if transform_probability > 0
            else None
        )
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.pairs)

    def shrink_dataset(self, new_size: int):
        """Reference parity (``image_dataset.py:136-137``)."""
        self.pairs = self.pairs[:new_size]

    def check_for_bad_label(self, label: np.ndarray, image_size):
        """10%-tolerance bbox sanity check (``image_dataset.py:139-145``)."""
        extra = [s * 0.1 for s in image_size]
        ok = (
            (label[:, 0] >= -extra[0]).all()
            and (label[:, 1] >= -extra[1]).all()
            and (label[:, 2] <= image_size[0] + extra[0]).all()
            and (label[:, 3] <= image_size[1] + extra[1]).all()
        )
        if not ok:
            raise ValueError(
                f"Label can not be scaled correctly; image size "
                f"{image_size}, label {label}"
            )

    def get_example(self, i: int):
        try:
            path, label = self.pairs[i]
            img = load_image(path, "RGB")
        except Exception as e:  # fall back to example 0 (reference :148-152)
            print(e)
            path, label = self.pairs[0]
            img = load_image(path, "RGB")
        label = np.asarray(label, dtype=np.float32)

        if label.ndim > 0 and label.size % 4 == 0 and label.size > 0:
            label = label.reshape(-1, 4)
        if img.shape[-1] == 1:
            img = np.tile(img, (1, 1, 3))
        if self.pipeline is not None:
            img = self.pipeline(img.astype(np.uint8), self._rng)

        if self.image_size is not None:
            in_size = img.shape[:2]
            if label.ndim > 1:
                self.check_for_bad_label(label, in_size)
                label = resize_bbox(label, in_size, self.image_size)
            img = resize_image(img, self.image_size, self.image_mode)

        if self.output_dtype == "uint8":
            img = np.ascontiguousarray(np.clip(img, 0, 255), dtype=np.uint8)
        else:
            img = np.ascontiguousarray(img, dtype=np.float32) / 255.0
        label = label.astype(self.label_dtype)
        if self.return_dummy_scores:
            return img, label, np.zeros((1,), dtype=np.float32)
        return img, label

    def __getitem__(self, i):
        return self.get_example(i)


class DiscriminatorImageDataset(ImageDataset):
    """Unlabeled images with a constant label
    (``image_dataset.py:185-193``)."""

    def __init__(self, *args, label: float, **kwargs):
        self.label = label
        super().__init__(*args, **kwargs)

    def get_example(self, i: int):
        img = super().get_example(i)
        return img, np.asarray([self.label], dtype=np.float32)
