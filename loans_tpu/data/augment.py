"""Host-side image augmentations (numpy/cv2), imgaug-parity.

The reference composes imgaug pipelines
(``common/datasets/image_dataset.py:57-69,112-125``):
  Sometimes(p, SomeOf((0, None), [Fliplr, AddToHueAndSaturation(±20),
  CropAndPad(±10%), ContrastNormalization(0.75-1.0),
  Multiply(0.8-1.2, per_channel=0.2)], random_order=True)).

imgaug is unmaintained; this module re-implements the used operators on
uint8 HWC numpy arrays with an explicit ``np.random.Generator`` (no
global RNG), so augmentation is reproducible per-worker.
"""

from __future__ import annotations

from typing import Callable, Sequence

import cv2
import numpy as np


def fliplr(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    del rng
    return img[:, ::-1]


def add_to_hue_and_saturation(
    img: np.ndarray, rng: np.random.Generator, lo: float = -20, hi: float = 20
) -> np.ndarray:
    """Shift hue and saturation by independent uniform offsets
    (imgaug ``AddToHueAndSaturation(Uniform(-20, 20), per_channel=True)``)."""
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int16)
    hue_shift = int(rng.uniform(lo, hi))
    sat_shift = int(rng.uniform(lo, hi))
    hsv[..., 0] = (hsv[..., 0] + hue_shift) % 180
    hsv[..., 1] = np.clip(hsv[..., 1] + sat_shift, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def crop_and_pad(
    img: np.ndarray,
    rng: np.random.Generator,
    lo: float = -0.10,
    hi: float = 0.10,
) -> np.ndarray:
    """Crop (negative) or pad (positive) each side by an independent
    percentage, then resize back (imgaug ``CropAndPad(percent=(-0.1, 0.1),
    pad_mode=['constant', 'edge'])``)."""
    h, w = img.shape[:2]
    pcts = rng.uniform(lo, hi, size=4)  # top, right, bottom, left
    mode = rng.choice(["constant", "edge"])
    top, right, bottom, left = (
        int(pcts[0] * h),
        int(pcts[1] * w),
        int(pcts[2] * h),
        int(pcts[3] * w),
    )

    def crop_amounts(v):
        return max(0, -v)

    def pad_amounts(v):
        return max(0, v)

    ct, cr, cb, cl = map(crop_amounts, (top, right, bottom, left))
    out = img[ct : h - cb if cb else h, cl : w - cr if cr else w]
    pt, pr, pb, pl = map(pad_amounts, (top, right, bottom, left))
    if any((pt, pr, pb, pl)):
        pad_width = ((pt, pb), (pl, pr)) + ((0, 0),) * (img.ndim - 2)
        out = np.pad(
            out, pad_width, mode="constant" if mode == "constant" else "edge"
        )
    if out.shape[:2] != (h, w):
        out = cv2.resize(out, (w, h), interpolation=cv2.INTER_LINEAR)
    return out


def contrast_normalization(
    img: np.ndarray, rng: np.random.Generator, lo: float = 0.75, hi: float = 1.0
) -> np.ndarray:
    alpha = rng.uniform(lo, hi)
    out = (img.astype(np.float32) - 128.0) * alpha + 128.0
    return np.clip(out, 0, 255).astype(np.uint8)


def multiply(
    img: np.ndarray,
    rng: np.random.Generator,
    lo: float = 0.8,
    hi: float = 1.2,
    per_channel_prob: float = 0.2,
) -> np.ndarray:
    if rng.uniform() < per_channel_prob:
        factors = rng.uniform(lo, hi, size=(1, 1, img.shape[-1]))
    else:
        factors = rng.uniform(lo, hi)
    out = img.astype(np.float32) * factors
    return np.clip(out, 0, 255).astype(np.uint8)


Augmenter = Callable[[np.ndarray, np.random.Generator], np.ndarray]


class SomeOf:
    """Apply a random subset of ops in random order with probability p
    (imgaug ``Sometimes(p, SomeOf((0, None), ops, random_order=True))``)."""

    def __init__(self, ops: Sequence[Augmenter], probability: float):
        self.ops = list(ops)
        self.probability = probability

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() >= self.probability:
            return img
        n = int(rng.integers(0, len(self.ops) + 1))
        order = rng.permutation(len(self.ops))[:n]
        for idx in order:
            img = self.ops[idx](img, rng)
        return img


def unlabeled_pipeline(probability: float) -> SomeOf:
    """Augmentation used for the unlabeled localizer stream
    (``image_dataset.py:57-69``)."""
    return SomeOf(
        [fliplr, add_to_hue_and_saturation, crop_and_pad], probability
    )


def labeled_pipeline(probability: float) -> SomeOf:
    """Augmentation used for labeled data (``image_dataset.py:112-125``)."""
    return SomeOf(
        [fliplr, add_to_hue_and_saturation, contrast_normalization, multiply],
        probability,
    )


def random_crop_flip(
    img: np.ndarray,
    rng: np.random.Generator,
    probability: float,
    min_crop_ratio: float = 0.6,
    max_crop_ratio: float = 0.9,
    crop_always: bool = False,
) -> np.ndarray:
    """The ``--no-imgaug`` fallback: random crop (p=0.5 or always) +
    random horizontal flip (``image_dataset.py:86-90``)."""
    if rng.uniform() >= probability:
        return img
    if crop_always or rng.uniform() <= 0.5:
        ratio = rng.uniform(min_crop_ratio, max_crop_ratio)
        h, w = img.shape[:2]
        ch, cw = int(h * ratio), int(w * ratio)
        y0 = int(rng.integers(0, h - ch + 1))
        x0 = int(rng.integers(0, w - cw + 1))
        img = img[y0 : y0 + ch, x0 : x0 + cw]
    if rng.uniform() < 0.5:
        img = img[:, ::-1]
    return img
