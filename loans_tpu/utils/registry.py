"""Declarative model registry.

The reference makes checkpoints self-describing by COPYING the model
source files into the log dir and re-importing them at eval/inference
time (``train_utils/logger.py:16-26``, ``train_utils/module_loading.py:5-15``,
``evaluate.py:45-50``). That is an ``eval``-on-disk contract. Here the
checkpoint manifest records ``{"model": <registry name>, "kwargs": ...}``
and models are rebuilt from a registry — same ergonomics (a log dir is
all you need to re-run), no code execution from data directories.
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, Callable[..., Any]] = {}


def register_model(name: str, factory: Callable[..., Any] | None = None):
    """Register a model factory (usable as decorator)."""

    def _register(f):
        _REGISTRY[name] = f
        return f

    if factory is not None:
        return _register(factory)
    return _register


def get_model_class(name: str) -> Callable[..., Any]:
    _ensure_builtins()
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def build_model(name: str, **kwargs) -> Any:
    """Instantiate a registered model from manifest kwargs."""
    from loans_tpu.ops.geometry import Size

    factory = get_model_class(name)
    # Size round-trips through JSON as a 2-list; restore known size kwargs.
    for key in ("out_size", "input_size", "image_size"):
        if key in kwargs and isinstance(kwargs[key], (list, tuple)):
            kwargs[key] = Size(*kwargs[key])
    return factory(**kwargs)


def _ensure_builtins():
    if "Localizer" in _REGISTRY:
        return
    from loans_tpu import models

    _REGISTRY.setdefault("Localizer", models.Localizer)
    _REGISTRY.setdefault("ResnetAssessor", models.ResnetAssessor)
    _REGISTRY.setdefault("ResNet", models.ResNet)
    try:
        _REGISTRY.setdefault("SSD300", models.SSD300)
        _REGISTRY.setdefault("SSD512", models.SSD512)
    except AttributeError:
        pass
