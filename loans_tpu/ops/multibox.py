"""Multibox (SSD) machinery: default boxes, encode/decode, multibox loss.

Re-design of what the reference delegates to chainercv's SSD stack
(``schaaaafrichter/train.py:34-53`` ``MultiboxTrainChain`` with
``multibox_loss``; chainercv ``MultiboxCoder`` used implicitly through
``Transform``'s ``self.coder.encode``, ``train.py:110-113``).

TPU-first: encoding happens on host per-sample (ragged gt), but the loss
— including hard negative mining — is a fixed-shape jitted program using
``top_k`` instead of data-dependent sorting, and decode+NMS-prep runs
batched on device.

Conventions: boxes are (y_min, x_min, y_max, x_max) normalized to [0, 1];
default boxes are (cy, cx, h, w). Variances (0.1, 0.2), chainercv
defaults.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def default_boxes(
    image_size: int,
    grids: Sequence[int],
    steps: Sequence[int],
    sizes: Sequence[int],
    aspect_ratios: Sequence[tuple[int, ...]],
) -> np.ndarray:
    """(K, 4) (cy, cx, h, w) default boxes, chainercv SSD layout.

    Per cell: size s, sqrt(s*s'), and a pair of boxes per aspect ratio.
    """
    boxes = []
    for k, (grid, step) in enumerate(zip(grids, steps)):
        s = sizes[k] / image_size
        s_next = math.sqrt(s * sizes[k + 1] / image_size)
        for i, j in itertools.product(range(grid), repeat=2):
            cy = (i + 0.5) * step / image_size
            cx = (j + 0.5) * step / image_size
            boxes.append((cy, cx, s, s))
            boxes.append((cy, cx, s_next, s_next))
            for ar in aspect_ratios[k]:
                r = math.sqrt(ar)
                boxes.append((cy, cx, s / r, s * r))
                boxes.append((cy, cx, s * r, s / r))
    return np.asarray(boxes, dtype=np.float32)


def _cychw_to_yxyx(d: np.ndarray) -> np.ndarray:
    tl = d[:, :2] - d[:, 2:] / 2
    br = d[:, :2] + d[:, 2:] / 2
    return np.concatenate([tl, br], axis=1)


class MultiboxCoder:
    """Encode gt boxes to per-anchor targets / decode predictions."""

    def __init__(
        self, default_bbox: np.ndarray, variance=(0.1, 0.2),
        iou_thresh: float = 0.5,
    ):
        self.default_bbox = np.asarray(default_bbox, dtype=np.float32)
        self.default_yxyx = _cychw_to_yxyx(self.default_bbox)
        self.variance = variance
        self.iou_thresh = iou_thresh

    def encode(self, bbox: np.ndarray, label: np.ndarray):
        """Per-image host-side target assignment (chainercv semantics).

        Args:
          bbox: (R, 4) normalized yxyx gt boxes.
          label: (R,) int class ids (0-based foreground).

        Returns:
          (loc (K, 4), conf (K,) int32) — conf 0 is background, gt class
          c becomes c+1.
        """
        bbox = np.asarray(bbox, dtype=np.float32).reshape(-1, 4)
        K = self.default_bbox.shape[0]
        if bbox.shape[0] == 0:
            return (
                np.zeros((K, 4), dtype=np.float32),
                np.zeros((K,), dtype=np.int32),
            )
        from loans_tpu.evaluation.voc import _bbox_iou

        iou = _bbox_iou(self.default_yxyx, bbox)  # (K, R)
        index = iou.argmax(axis=1)
        masked = iou.max(axis=1) >= self.iou_thresh
        # force-match: the best anchor of each gt is always positive
        best_anchor = iou.argmax(axis=0)
        masked[best_anchor] = True
        index[best_anchor] = np.arange(bbox.shape[0])

        matched = bbox[index]
        cy = (matched[:, :2] + matched[:, 2:]) / 2
        hw = matched[:, 2:] - matched[:, :2]
        d_cy = self.default_bbox[:, :2]
        d_hw = self.default_bbox[:, 2:]
        loc = np.concatenate(
            [
                (cy - d_cy) / (self.variance[0] * d_hw),
                np.log(np.maximum(hw, 1e-8) / d_hw) / self.variance[1],
            ],
            axis=1,
        ).astype(np.float32)
        conf = np.where(
            masked, label[index].astype(np.int32) + 1, 0
        ).astype(np.int32)
        loc = np.where(masked[:, None], loc, 0.0).astype(np.float32)
        return loc, conf

    def decode_batch(self, mb_loc: jax.Array) -> jax.Array:
        """Device-side batched decode: (N, K, 4) offsets -> normalized
        yxyx boxes."""
        d = jnp.asarray(self.default_bbox)
        cy = mb_loc[..., :2] * self.variance[0] * d[:, 2:] + d[:, :2]
        # clip the log-size offset so untrained/garbage logits cannot
        # overflow exp() into inf boxes (e^10 ~ 22000x the anchor)
        hw = jnp.exp(
            jnp.clip(mb_loc[..., 2:] * self.variance[1], -10.0, 10.0)
        ) * d[:, 2:]
        tl = cy - hw / 2
        br = cy + hw / 2
        return jnp.concatenate([tl, br], axis=-1)


def smooth_l1(x: jax.Array) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def multibox_loss(
    mb_loc: jax.Array,
    mb_conf: jax.Array,
    gt_loc: jax.Array,
    gt_conf: jax.Array,
    k: int = 3,
):
    """SSD loss with hard negative mining (chainercv ``multibox_loss``).

    Args:
      mb_loc: (N, K, 4) predicted offsets.
      mb_conf: (N, K, C+1) class logits (0 = background).
      gt_loc: (N, K, 4) encoded targets.
      gt_conf: (N, K) int class targets.
      k: negatives per positive.

    Returns:
      (loc_loss, conf_loss) scalars, each normalized by total positives.
    """
    positive = gt_conf > 0  # (N, K)
    n_pos = jnp.sum(positive)
    n_pos_f = jnp.maximum(n_pos.astype(jnp.float32), 1.0)

    loc_loss = jnp.sum(
        jnp.sum(smooth_l1(mb_loc - gt_loc), axis=-1) * positive
    ) / n_pos_f

    ce = -jax.nn.log_softmax(mb_conf, axis=-1)
    conf_all = jnp.take_along_axis(
        ce, gt_conf[..., None].astype(jnp.int32), axis=-1
    )[..., 0]  # (N, K)

    # hard negative mining per image: top (k * n_pos_i) background losses
    neg_losses = jnp.where(positive, -jnp.inf, conf_all)
    rank = jnp.argsort(jnp.argsort(-neg_losses, axis=1), axis=1)
    n_pos_per_img = jnp.sum(positive, axis=1, keepdims=True)
    hard_neg = rank < (k * n_pos_per_img)

    conf_loss = jnp.sum(
        jnp.where(positive | hard_neg, conf_all, 0.0)
    ) / n_pos_f
    return loc_loss, conf_loss
