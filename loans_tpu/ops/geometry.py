"""Affine-grid geometry: corners, boxes, IoU.

Reference semantics (Bartzi/loans):
  * ``common/utils.py:142-158`` (``LossCalculator.get_corners``)
  * ``train_utils/match_bbox.py:32-67`` (``get_bbox_corners`` / ``get_aabb_corners``)
  * ``sheep/sheep_localizer.py:84-97`` (``extract_corners`` / ``scale_bboxes``)
  * chainercv ``bbox_iou`` ((y_min, x_min, y_max, x_max) convention)

TPU-first design note: the reference materializes the full sampling grid
(N, 2, H, W) and slices its corner pixels. Every consumer only ever needs
the four corners, which are an affine function of the transform parameters
— so here everything is computed directly from ``theta`` (N, 2, 3) and the
grid tensor never has to exist in HBM. The materialized-grid code paths
are kept only for parity testing and visualization.

Conventions:
  * theta is (N, 2, 3); input point (x_in, y_in) = theta @ (x_out, y_out, 1),
    all coordinates normalized to [-1, 1] ((-1,-1) = top-left corner).
  * boxes are (y_min, x_min, y_max, x_max), pixels, matching chainercv.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Size(NamedTuple):
    """Image size, mirroring ``common/utils.py:8``."""

    height: int
    width: int


# Normalized output-space corner coordinates (x, y):
# top-left, top-right, bottom-left, bottom-right.
_CORNER_XY = jnp.array(
    [[-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0], [1.0, 1.0]], dtype=jnp.float32
)


def theta_corners(theta: jax.Array) -> jax.Array:
    """Corners of the sampling region implied by affine params.

    Args:
      theta: (..., 2, 3) affine transforms.

    Returns:
      (..., 4, 2) corner coordinates (x, y), normalized to [-1, 1], in the
      order [top-left, top-right, bottom-left, bottom-right]. These equal
      grid[..., {0,-1}, {0,-1}] of the materialized sampling grid
      (``F.spatial_transformer_grid`` in the reference).
    """
    theta = jnp.asarray(theta)
    a = theta[..., :, :2]  # (..., 2, 2)
    t = theta[..., :, 2]  # (..., 2)
    corners = jnp.einsum(
        "...ij,cj->...ci",
        a,
        _CORNER_XY.astype(theta.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return corners + t[..., None, :]


def grid_corners(grid: jax.Array) -> jax.Array:
    """Corners from a materialized grid (parity path).

    Args:
      grid: (N, H, W, 2) sampling grid with channels (x, y).

    Returns:
      (N, 4, 2) corners [tl, tr, bl, br] as (x, y).
    """
    tl = grid[:, 0, 0, :]
    tr = grid[:, 0, -1, :]
    bl = grid[:, -1, 0, :]
    br = grid[:, -1, -1, :]
    return jnp.stack([tl, tr, bl, br], axis=1)


def scale_corners(corners: jax.Array, image_size: Size) -> jax.Array:
    """[-1, 1] corner coords -> pixel coords ((g + 1) / 2 * size).

    Mirrors ``common/utils.py:145-147``.
    """
    half = (corners + 1.0) / 2.0
    scale = jnp.array(
        [image_size.width, image_size.height], dtype=corners.dtype
    )
    return half * scale


def corners_to_aabb(
    corners: jax.Array, image_size: Size, clip: bool = True
) -> jax.Array:
    """Axis-aligned bounding box enclosing the (possibly rotated) corners.

    Mirrors ``train_utils/match_bbox.py:46-67`` (``get_aabb_corners``):
    scale to pixels, clip to the image, then take the enclosing aabb as
    min/max over the relevant corner pairs.

    Args:
      corners: (N, 4, 2) normalized corners [tl, tr, bl, br], (x, y).
      image_size: target image size.
      clip: clip pixel coords into the image first (reference behavior).

    Returns:
      (N, 4) boxes (y_min, x_min, y_max, x_max) in pixels.
    """
    px = scale_corners(corners, image_size)
    if clip:
        hi = jnp.array(
            [image_size.width, image_size.height], dtype=px.dtype
        )
        px = jnp.clip(px, 0.0, hi)
    tl, tr, bl, br = px[:, 0], px[:, 1], px[:, 2], px[:, 3]
    x_min = jnp.minimum(tl[:, 0], bl[:, 0])
    y_min = jnp.minimum(tl[:, 1], tr[:, 1])
    x_max = jnp.maximum(tr[:, 0], br[:, 0])
    y_max = jnp.maximum(bl[:, 1], br[:, 1])
    return jnp.stack([y_min, x_min, y_max, x_max], axis=1)


def corners_to_bbox(corners: jax.Array, image_size: Size) -> jax.Array:
    """Diagonal-corner box without clipping.

    Mirrors ``sheep/sheep_localizer.py:84-97`` (``extract_corners`` +
    ``scale_bboxes``): uses only the top-left and bottom-right grid corners
    and does not clip, so boxes may lie outside the image or be inverted
    for degenerate transforms.

    Returns:
      (N, 4) boxes (y_min, x_min, y_max, x_max) in pixels.
    """
    px = scale_corners(corners, image_size)
    tl, br = px[:, 0], px[:, 3]
    return jnp.stack([tl[:, 1], tl[:, 0], br[:, 1], br[:, 0]], axis=1)


def box_to_theta(boxes_xyxy: jax.Array, image_size: Size) -> jax.Array:
    """Axis-aligned theta whose STN crop renders exactly the pixel box.

    Inverse of the *sampler's* coordinate convention (align-corners,
    ``ops/stn.py``: px = (x + 1) / 2 * (W - 1)): the crop's first/last
    samples land on pixels x1 and x2 - 1 — the same pixels a PIL
    ``crop((x1, y1, x2, y2))`` contains. Used to synthesize known-IoU
    assessor crops through the production STN operator.

    Args:
      boxes_xyxy: (..., 4) pixel boxes (x1, y1, x2, y2), exclusive end.
      image_size: source image size.

    Returns:
      (..., 2, 3) axis-aligned affine params.
    """
    boxes_xyxy = jnp.asarray(boxes_xyxy, dtype=jnp.float32)
    x1, y1, x2, y2 = (boxes_xyxy[..., i] for i in range(4))
    w1 = max(image_size.width - 1, 1)
    h1 = max(image_size.height - 1, 1)
    sx = (x2 - x1 - 1.0) / w1
    sy = (y2 - y1 - 1.0) / h1
    tx = (x1 + x2 - 1.0) / w1 - 1.0
    ty = (y1 + y2 - 1.0) / h1 - 1.0
    zeros = jnp.zeros_like(sx)
    row_x = jnp.stack([sx, zeros, tx], axis=-1)
    row_y = jnp.stack([zeros, sy, ty], axis=-1)
    return jnp.stack([row_x, row_y], axis=-2)


def bbox_iou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise IoU matrix, chainercv ``bbox_iou`` semantics.

    Args:
      boxes_a: (N, 4) (y_min, x_min, y_max, x_max).
      boxes_b: (K, 4).

    Returns:
      (N, K) IoU matrix. Degenerate boxes yield 0.
    """
    tl = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    br = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.prod(jnp.clip(boxes_a[:, 2:] - boxes_a[:, :2], 0.0), axis=1)
    area_b = jnp.prod(jnp.clip(boxes_b[:, 2:] - boxes_b[:, :2], 0.0), axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def elementwise_iou(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Per-row IoU of matched box pairs ((N, 4) x (N, 4) -> (N,)).

    Equivalent to ``diag(bbox_iou(a, b))`` as used by the in-training
    evaluator (``sheep/sheep_evaluator.py:45``) but without forming the
    full N x N matrix.
    """
    tl = jnp.maximum(boxes_a[:, :2], boxes_b[:, :2])
    br = jnp.minimum(boxes_a[:, 2:], boxes_b[:, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = jnp.prod(jnp.clip(boxes_a[:, 2:] - boxes_a[:, :2], 0.0), axis=1)
    area_b = jnp.prod(jnp.clip(boxes_b[:, 2:] - boxes_b[:, :2], 0.0), axis=1)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
