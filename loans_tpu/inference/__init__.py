"""Inference wrappers: load-from-log-dir localizer, async worker, camera."""

from loans_tpu.inference.localizer import LocalizerInference
from loans_tpu.inference.async_worker import AsynchronousLocalizer

__all__ = ["LocalizerInference", "AsynchronousLocalizer"]
