"""Localizer regularization losses.

Reference semantics: ``common/utils.py`` loss calculators —
``DirectionLossCalculator`` (:163-178), ``OutOfImageLossCalculator``
(:301-316), ``MinAreaLossCalculator`` (:181-198), ``MaxAreaLossCalculator``
(:201-214), ``AspectRatioLossCalculator`` (:217-239),
``TransformParameterRegressionLossCalculator`` (:242-298).

All losses are pure functions of the affine-transform corners
(``geometry.theta_corners``); no materialized sampling grid is needed.
Reductions (mean vs. sum) follow the reference exactly, since they set the
effective regularizer weight relative to the assessor MSE term.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from loans_tpu.ops.geometry import Size, bbox_iou, scale_corners


def direction_loss(corners: jax.Array, image_size: Size) -> jax.Array:
    """Penalize upside-down / mirrored sampling regions.

    ``common/utils.py:163-178``: mean(relu(tl_y - bl_y)) +
    mean(relu(tl_x - tr_x)), on pixel-scaled (unclipped) corners.
    """
    px = scale_corners(corners, image_size)
    tl, tr, bl = px[:, 0], px[:, 1], px[:, 2]
    up_down = jnp.mean(jnp.maximum(tl[:, 1] - bl[:, 1], 0.0))
    left_right = jnp.mean(jnp.maximum(tl[:, 0] - tr[:, 0], 0.0))
    return up_down + left_right


def out_of_image_loss(corners: jax.Array) -> jax.Array:
    """Penalize corner coordinates outside the normalized image [-1, 1].

    ``common/utils.py:301-316``: over the values {tl_x, tl_y, tr_x, bl_y}
    of every sample, sum |min(v + 1, 0)| + max(v - 1, 0). Note the
    reference reduces with a *sum* (scales with batch size) — preserved.
    """
    tl, tr, bl = corners[:, 0], corners[:, 1], corners[:, 2]
    vals = jnp.concatenate([tl[:, 0], tl[:, 1], tr[:, 0], bl[:, 1]], axis=0)
    low = jnp.abs(jnp.minimum(vals + 1.0, 0.0))
    high = jnp.maximum(vals - 1.0, 0.0)
    return jnp.sum(low) + jnp.sum(high)


def min_area_loss(
    corners: jax.Array, image_size: Size, out_size: Size
) -> jax.Array:
    """Penalize regions smaller than the crop size.

    ``common/utils.py:181-198``: width/height from pixel-scaled corners;
    sum(relu(out_w - w)) + sum(relu(out_h - h)).
    """
    px = scale_corners(corners, image_size)
    widths = px[:, 1, 0] - px[:, 0, 0]
    heights = px[:, 2, 1] - px[:, 0, 1]
    w_loss = jnp.maximum(float(out_size.width) - widths, 0.0)
    h_loss = jnp.maximum(float(out_size.height) - heights, 0.0)
    return jnp.sum(w_loss) + jnp.sum(h_loss)


def max_area_loss(corners: jax.Array, image_size: Size) -> jax.Array:
    """Penalize regions larger than the image (``common/utils.py:201-214``)."""
    px = scale_corners(corners, image_size)
    widths = px[:, 1, 0] - px[:, 0, 0]
    heights = px[:, 2, 1] - px[:, 0, 1]
    w_loss = jnp.maximum(widths - float(image_size.width), 0.0)
    h_loss = jnp.maximum(heights - float(image_size.height), 0.0)
    return jnp.sum(w_loss) + jnp.sum(h_loss)


def aspect_ratio_loss(corners: jax.Array, image_size: Size) -> jax.Array:
    """Penalize tall aspect ratios (``common/utils.py:217-239``).

    width/height are euclidean side lengths of the (possibly rotated)
    region; loss = mean(relu(height / max(width, 1) - 0.5)).
    """
    px = scale_corners(corners, image_size)
    tl, tr, bl = px[:, 0], px[:, 1], px[:, 2]
    width = jnp.sqrt(jnp.sum(jnp.square(tr - tl), axis=1))
    height = jnp.sqrt(jnp.sum(jnp.square(bl - tl), axis=1))
    aspect = height / jnp.maximum(width, 1.0)
    return jnp.mean(jnp.maximum(aspect - 0.5, 0.0))


def huber_loss(x: jax.Array, t: jax.Array, delta: float = 1.0) -> jax.Array:
    """Chainer ``F.huber_loss`` semantics: per-sample sum over last axis."""
    d = x - t
    abs_d = jnp.abs(d)
    quad = 0.5 * jnp.square(d)
    lin = delta * (abs_d - 0.5 * delta)
    return jnp.sum(jnp.where(abs_d <= delta, quad, lin), axis=-1)


def transform_param_regression_loss(
    corners: jax.Array,
    gt_boxes: jax.Array,
    gt_mask: jax.Array,
    objectness_scores: jax.Array,
    pos_iou_threshold: float = 0.7,
    ignore_iou_low: float = 0.3,
) -> tuple[jax.Array, jax.Array]:
    """RPN-style anchor-matched regression + objectness loss.

    Re-design of ``common/utils.py:242-298`` with static shapes: the
    reference builds index lists with data-dependent concatenation; here
    every predicted region is matched against every (masked) gt box and
    contributions are masked, which jit-compiles to fixed shapes.

    Args:
      corners: (N, 4, 2) normalized corners of predicted regions.
      gt_boxes: (G, 4) gt boxes as (x_min, y_min, x_max, y_max) in
        normalized [-1, 1] coordinates (the reference compares against
        unscaled corners, ``common/utils.py:245-249``).
      gt_mask: (G,) bool validity mask for padded gt rows.
      objectness_scores: (N, 2) logits.

    Returns:
      (regression_loss, objectness_loss) scalars.
    """
    tl, tr, bl = corners[:, 0], corners[:, 1], corners[:, 2]
    # (x1, y1, x2, y2) exactly as the reference assembles them.
    pred = jnp.stack([tl[:, 0], tl[:, 1], tr[:, 0], bl[:, 1]], axis=1)

    ious = bbox_iou(gt_boxes, pred)  # (G, N)
    ious = jnp.where(gt_mask[:, None], ious, -1.0)

    positive = ious >= pos_iou_threshold  # (G, N)
    has_positive = jnp.any(positive, axis=1)
    best = jax.nn.one_hot(jnp.argmax(ious, axis=1), pred.shape[0]) > 0
    matched = jnp.where(has_positive[:, None], positive, best)
    matched = jnp.logical_and(matched, gt_mask[:, None])

    per_pair = huber_loss(
        jnp.broadcast_to(pred[None, :, :], (gt_boxes.shape[0],) + pred.shape),
        jnp.broadcast_to(gt_boxes[:, None, :], (gt_boxes.shape[0],) + pred.shape),
    )  # (G, N)
    n_matched = jnp.maximum(jnp.sum(matched), 1)
    reg_loss = jnp.sum(jnp.where(matched, per_pair, 0.0)) / n_matched

    is_positive = jnp.any(matched, axis=0)  # (N,)
    in_ignore_band = jnp.any(
        jnp.logical_and(
            jnp.logical_and(ious > ignore_iou_low, ious < pos_iou_threshold),
            gt_mask[:, None],
        ),
        axis=0,
    )
    ignore = jnp.logical_and(in_ignore_band, jnp.logical_not(is_positive))
    labels = is_positive.astype(jnp.int32)
    log_probs = jax.nn.log_softmax(objectness_scores, axis=-1)
    ce = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    valid = jnp.logical_not(ignore)
    obj_loss = jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )
    return reg_loss, obj_loss


def iou_loss(
    pred_boxes: jax.Array, gt_boxes: jax.Array
) -> jax.Array:
    """1 - mean elementwise IoU of matched (y1, x1, y2, x2) box pairs.

    Parity with the reference's available-but-unwired ``IOUCalculator``
    (``common/utils.py:21-85``), which scores predicted grid aabbs
    against gt boxes; usable as a supervised localizer loss.
    """
    from loans_tpu.ops.geometry import elementwise_iou

    return 1.0 - jnp.mean(elementwise_iou(pred_boxes, gt_boxes))


def smooth_iou_loss(
    pred_boxes: jax.Array, gt_boxes: jax.Array, beta: float = 1.0
) -> jax.Array:
    """Differentiable IoU with softplus-smoothed intersection clamping.

    Parity with ``SmoothIOUCalculator`` (``common/utils.py:88-134``):
    the hard ``max(0, .)`` on intersection extents (zero gradient once
    boxes separate) is replaced by ``softplus_beta``, so gradients keep
    pulling disjoint boxes together.
    """
    tl = jnp.maximum(pred_boxes[:, :2], gt_boxes[:, :2])
    br = jnp.minimum(pred_boxes[:, 2:], gt_boxes[:, 2:])
    wh = jax.nn.softplus((br - tl) * beta) / beta
    inter = wh[:, 0] * wh[:, 1]
    area_p = jnp.prod(
        jnp.clip(pred_boxes[:, 2:] - pred_boxes[:, :2], 0.0), axis=1
    )
    area_g = jnp.prod(
        jnp.clip(gt_boxes[:, 2:] - gt_boxes[:, :2], 0.0), axis=1
    )
    union = jnp.maximum(area_p + area_g - inter, 1e-6)
    return 1.0 - jnp.mean(inter / union)


def random_pairs(rng: jax.Array, n: int) -> jax.Array:
    """Random index pairing (``common/utils.py:11-18``): a shuffled
    partner index for each of n elements."""
    return jax.random.permutation(rng, n)
