"""Core TPU-native ops: geometry, spatial transformer, losses."""

from loans_tpu.ops.geometry import (
    Size,
    bbox_iou,
    corners_to_aabb,
    corners_to_bbox,
    elementwise_iou,
    grid_corners,
    scale_corners,
    theta_corners,
)
from loans_tpu.ops.losses import (
    aspect_ratio_loss,
    direction_loss,
    max_area_loss,
    min_area_loss,
    out_of_image_loss,
    transform_param_regression_loss,
)
from loans_tpu.ops.rotation_dropout import rotation_dropout
from loans_tpu.ops.stn import (
    affine_grid,
    sample_grid,
    sample_rotated_dense,
    sample_rotated_pallas,
    sample_separable,
    sample_separable_pallas,
    spatial_transform,
)

__all__ = [
    "Size",
    "bbox_iou",
    "corners_to_aabb",
    "corners_to_bbox",
    "elementwise_iou",
    "grid_corners",
    "scale_corners",
    "theta_corners",
    "aspect_ratio_loss",
    "direction_loss",
    "max_area_loss",
    "min_area_loss",
    "out_of_image_loss",
    "transform_param_regression_loss",
    "rotation_dropout",
    "affine_grid",
    "sample_grid",
    "sample_rotated_dense",
    "sample_rotated_pallas",
    "sample_separable",
    "sample_separable_pallas",
    "spatial_transform",
]
