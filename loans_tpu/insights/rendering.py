"""Host-side drawing primitives (PIL) for plots and prediction renders.

Color map and box drawing match ``insights/bbox_plotter.py`` (20-color
``COLOR_MAP`` :25-48, ``draw_bboxes`` :294-313, gt overlay :349-359).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

# 20 distinguishable colors (reference COLOR_MAP, insights/bbox_plotter.py:25-48)
COLOR_MAP = [
    (230, 25, 75),
    (60, 180, 75),
    (255, 225, 25),
    (0, 130, 200),
    (245, 130, 48),
    (145, 30, 180),
    (70, 240, 240),
    (240, 50, 230),
    (210, 245, 60),
    (250, 190, 190),
    (0, 128, 128),
    (230, 190, 255),
    (170, 110, 40),
    (255, 250, 200),
    (128, 0, 0),
    (170, 255, 195),
    (128, 128, 0),
    (255, 215, 180),
    (0, 0, 128),
    (128, 128, 128),
]
GT_COLOR = (255, 255, 255)


def _to_pil(image: np.ndarray) -> Image.Image:
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.5 else arr, 0, 255)
        arr = arr.astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return Image.fromarray(arr)


def draw_boxes_on_image(
    image: np.ndarray,
    boxes: np.ndarray,
    gt_boxes: np.ndarray | None = None,
    scores=None,
    width: int = 2,
) -> Image.Image:
    """Draw predicted (colored) and gt (white) yxyx boxes on an image."""
    img = _to_pil(image).convert("RGB")
    draw = ImageDraw.Draw(img)
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    for i, (y1, x1, y2, x2) in enumerate(boxes):
        color = COLOR_MAP[i % len(COLOR_MAP)]
        x1, x2 = sorted((float(x1), float(x2)))
        y1, y2 = sorted((float(y1), float(y2)))
        draw.rectangle([x1, y1, x2, y2], outline=color, width=width)
        if scores is not None and i < len(scores):
            draw.text((x1 + 2, max(y1 - 12, 0)), f"{scores[i]:.2f}", fill=color)
    if gt_boxes is not None:
        for y1, x1, y2, x2 in np.asarray(gt_boxes).reshape(-1, 4):
            draw.rectangle(
                [float(x1), float(y1), float(x2), float(y2)],
                outline=GT_COLOR,
                width=width,
            )
    return img


def heatmap_to_rgb(heat: np.ndarray) -> np.ndarray:
    """(H, W, 1) [0,1] heatmap -> (H, W, 3) uint8 grayscale tile
    (reference tiles the heatmap to HWC,
    ``unsupervised_sheep_localizer.py:50-54``)."""
    h = np.asarray(heat)
    if h.ndim == 3 and h.shape[-1] == 1:
        h = h[..., 0]
    h8 = np.clip(h * 255.0, 0, 255).astype(np.uint8)
    return np.stack([h8] * 3, axis=-1)


def hstack_images(images: list[Image.Image], pad: int = 2) -> Image.Image:
    """Horizontal concat with white padding."""
    h = max(im.height for im in images)
    w = sum(im.width for im in images) + pad * (len(images) - 1)
    canvas = Image.new("RGB", (w, h), (255, 255, 255))
    x = 0
    for im in images:
        canvas.paste(im, (x, 0))
        x += im.width + pad
    return canvas


def vstack_images(images: list[Image.Image], pad: int = 2) -> Image.Image:
    w = max(im.width for im in images)
    h = sum(im.height for im in images) + pad * (len(images) - 1)
    canvas = Image.new("RGB", (w, h), (255, 255, 255))
    y = 0
    for im in images:
        canvas.paste(im, (0, y))
        y += im.height + pad
    return canvas
