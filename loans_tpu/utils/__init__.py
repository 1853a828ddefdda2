"""Shared utilities: model registry, receptive-field arithmetic."""

from loans_tpu.utils.registry import (
    build_model,
    get_model_class,
    register_model,
)
from loans_tpu.utils.receptive_field import (
    ReceptiveField,
    bbox_to_feature_coords,
    calculate_receptive_fields,
)

__all__ = [
    "build_model",
    "get_model_class",
    "register_model",
    "ReceptiveField",
    "bbox_to_feature_coords",
    "calculate_receptive_fields",
]
