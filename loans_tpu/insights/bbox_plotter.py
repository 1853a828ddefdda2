"""BBoxPlotter: per-iteration visual audit of the localizer.

Parity with ``insights/bbox_plotter.py`` (``BBOXPlotter``): on a FIXED
test image, run the localizer+assessor in eval mode and compose a canvas
of [input+predicted box (+gt box) | extracted rois | VisualBackprop
heatmap | deepest feature map | PCA scatter of assessor features |
assessor score text], save it to ``<log_dir>/bboxes/<iteration>.png``
and push it over TCP to the live viewer (``send_image`` :89-115,
self-disabling on refusal :101-105). Runs at iteration 0 too
(``initialize``, :85-87).

TPU-first: one jitted eval forward returns rois, theta, the anchor
feature map, the sown VBP inputs and assessor features in a single
device round-trip; all drawing is host-side PIL.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any

import jax
import numpy as np
from PIL import Image, ImageDraw

from loans_tpu.insights.rendering import (
    COLOR_MAP,
    draw_boxes_on_image,
    heatmap_to_rgb,
    hstack_images,
)
from loans_tpu.insights.visual_backprop import flatten_vbp, visual_backprop
from loans_tpu.insights.progress_server import ImageClient
from loans_tpu.ops.geometry import corners_to_aabb, theta_corners


class BBoxPlotter:
    """Usable as a ``Hook`` fn: ``plotter(trainer, iteration)``."""

    def __init__(
        self,
        localizer,
        assessor,
        image: np.ndarray,
        log_dir: str,
        gt_bbox: np.ndarray | None = None,
        send_to: tuple[str, int] | None = None,
        show_visual_backprop: bool = True,
        show_features: bool = True,
        upstream_name: str = "bboxes",
    ):
        self.localizer = localizer
        self.assessor = assessor
        self.image = np.asarray(image, dtype=np.float32)
        if self.image.max() > 1.5:  # uint8-range input
            self.image = self.image / 255.0
        if self.image.ndim == 3:
            self.image = self.image[None]
        self.gt_bbox = gt_bbox
        self.out_dir = os.path.join(log_dir, upstream_name)
        os.makedirs(self.out_dir, exist_ok=True)
        self.client = ImageClient(*send_to) if send_to else None
        self.show_visual_backprop = show_visual_backprop
        self.show_features = show_features
        self._forward = jax.jit(partial(self._forward_impl))

    def enable_send(self):
        if self.client is not None:
            self.client.enable_send()

    def _forward_impl(self, loc_params, loc_stats, ass_params, images):
        (rois, theta), state = self.localizer.apply(
            {"params": loc_params, "batch_stats": loc_stats},
            images,
            train=False,
            mutable=["vbp", "vbp_anchor"],
        )
        score, ass_state = self.assessor.apply(
            {"params": ass_params}, rois, mutable=["features"]
        )
        boxes = corners_to_aabb(
            theta_corners(theta), self.localizer.input_size, clip=True
        )
        anchor = state["vbp_anchor"]["anchor"][0]
        heat = None
        if self.show_visual_backprop:
            heat = visual_backprop(
                anchor, flatten_vbp(state["vbp"]), self.localizer.vbp_ladder()
            )
        feats = ass_state["features"]["pre_head"][0]
        return rois, boxes, score, anchor, heat, feats

    def __call__(self, trainer, iteration: int) -> Image.Image:
        rois, boxes, score, anchor, heat, feats = jax.device_get(
            self._forward(
                trainer.loc_state.params,
                trainer.loc_state.batch_stats,
                trainer.ass_state.params,
                self.image,
            )
        )
        canvas = self.compose(rois, boxes, score, anchor, heat, feats)
        canvas.save(os.path.join(self.out_dir, f"{iteration}.png"))
        if self.client is not None and getattr(
            trainer, "bbox_vis_enabled", True
        ):
            sent = self.client.send(canvas, title=f"iteration {iteration}")
            if not sent:
                trainer.bbox_vis_enabled = False
        return canvas

    def compose(
        self, rois, boxes, score, anchor, heat, feats
    ) -> Image.Image:
        tiles: list[Image.Image] = []
        tiles.append(
            draw_boxes_on_image(
                self.image[0], boxes[:1], gt_boxes=self.gt_bbox
            )
        )
        h = tiles[0].height
        roi = np.clip(rois[0], 0.0, 1.0)
        tiles.append(_resize_to_height(_to_img(roi), h))
        if heat is not None:
            tiles.append(
                _resize_to_height(
                    Image.fromarray(heatmap_to_rgb(heat[0])), h
                )
            )
        if self.show_features:
            fmap = anchor[0].mean(axis=-1)
            fmap = (fmap - fmap.min()) / max(fmap.max() - fmap.min(), 1e-12)
            tiles.append(
                _resize_to_height(
                    Image.fromarray(heatmap_to_rgb(fmap[..., None])), h
                )
            )
            tiles.append(_pca_scatter(feats, size=h))
        canvas = hstack_images(tiles)
        draw = ImageDraw.Draw(canvas)
        draw.text(
            (4, canvas.height - 14),
            f"assessor: {float(np.ravel(score)[0]):.3f}",
            fill=COLOR_MAP[0],
        )
        return canvas


def _to_img(arr: np.ndarray) -> Image.Image:
    a = np.clip(np.asarray(arr, dtype=np.float32), 0, 1)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    return Image.fromarray((a * 255).astype(np.uint8))


def _resize_to_height(img: Image.Image, h: int) -> Image.Image:
    w = max(int(round(img.width * h / img.height)), 1)
    return img.resize((w, h), Image.BILINEAR)


def _pca_scatter(feats: np.ndarray, size: int = 224) -> Image.Image:
    """2-component PCA scatter of assessor features
    (``insights/bbox_plotter.py:264-281``), drawn without matplotlib."""
    x = np.asarray(feats, dtype=np.float64).reshape(feats.shape[0], -1)
    x = x - x.mean(axis=0, keepdims=True)
    img = Image.new("RGB", (size, size), (255, 255, 255))
    draw = ImageDraw.Draw(img)
    if min(x.shape) >= 2:
        # SVD on the (small) feature matrix; top-2 right singular vectors
        u, s, _ = np.linalg.svd(x, full_matrices=False)
        pts = u[:, :2] * s[:2]
        span = np.abs(pts).max() or 1.0
        for i, (px, py) in enumerate(pts):
            cx = int((px / span * 0.45 + 0.5) * size)
            cy = int((py / span * 0.45 + 0.5) * size)
            color = COLOR_MAP[i % len(COLOR_MAP)]
            draw.ellipse([cx - 3, cy - 3, cx + 3, cy + 3], fill=color)
    return img
