"""Observability: VisualBackprop, bbox plotting, live image streaming."""

from loans_tpu.insights.visual_backprop import (
    flatten_vbp,
    visual_backprop,
)
from loans_tpu.insights.rendering import (
    COLOR_MAP,
    draw_boxes_on_image,
    heatmap_to_rgb,
)
from loans_tpu.insights.bbox_plotter import BBoxPlotter
from loans_tpu.insights.progress_server import ImageClient, ImageServer

__all__ = [
    "flatten_vbp",
    "visual_backprop",
    "COLOR_MAP",
    "draw_boxes_on_image",
    "heatmap_to_rgb",
    "BBoxPlotter",
    "ImageClient",
    "ImageServer",
]
