"""Receptive-field arithmetic over static conv ladders.

Parity with ``train_utils/match_bbox.py``: ``LayerExtractor`` (walk the
autograd graph collecting conv/pool layers, :13-29),
``calculate_receptive_fields`` (:82-109) and
``bbox_coords_to_feature_coords`` (:70-79). JAX has no runtime graph to
walk; the conv geometry is already a pure function of the architecture —
the same ``(kind, kernel, stride, pad)`` ladders that drive
VisualBackprop (``models/resnet.py: resnet_vbp_ladder``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence


@dataclass(frozen=True)
class ReceptiveField:
    """RF of one ladder depth: size, total stride, center offset of
    feature (0,0) in input pixels."""

    size: int
    stride: int
    offset: float


def calculate_receptive_fields(
    ladder: Sequence[tuple],
) -> list[ReceptiveField]:
    """Cumulative receptive field after each ladder step.

    Standard RF recurrence: r' = r + (k-1)*j, j' = j*s,
    start' = start + ((k-1)/2 - p)*j.
    """
    out = []
    r, j, start = 1, 1, 0.5
    for kind, k, s, p in ladder:
        del kind
        r = r + (k - 1) * j
        start = start + ((k - 1) / 2 - p) * j
        j = j * s
        out.append(ReceptiveField(size=r, stride=j, offset=start))
    return out


def bbox_to_feature_coords(
    bbox, ladder: Sequence[tuple]
) -> tuple[float, float, float, float]:
    """Map an input-pixel (y1, x1, y2, x2) box to feature-map coords at
    the ladder's deepest level (``match_bbox.py:70-79``)."""
    rf = calculate_receptive_fields(ladder)[-1]
    y1, x1, y2, x2 = [float(v) for v in bbox]
    return (
        (y1 - rf.offset) / rf.stride,
        (x1 - rf.offset) / rf.stride,
        (y2 - rf.offset) / rf.stride,
        (x2 - rf.offset) / rf.stride,
    )
