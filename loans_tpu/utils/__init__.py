"""Shared utilities: model registry, checkpointing helpers, JSON log."""

from loans_tpu.utils.registry import (
    build_model,
    get_model_class,
    register_model,
)

__all__ = ["build_model", "get_model_class", "register_model"]
