"""Detection metrics beyond mAP: hit accuracy, NMS, score gating.

Reimplements ``evaluate.py:132-146`` (``postprocess_with_nms``: softmax
objectness over per-box class scores, threshold, NMS) and
``evaluate.py:170-195`` (``calc_accuracy``: per-image best-IoU hit
counting at ``iou_threshold``, bad-IoU pool, precision/recall/h-mean as
assembled at ``evaluate.py:286-314``).
"""

from __future__ import annotations

import numpy as np


def non_maximum_suppression(
    bbox: np.ndarray, thresh: float, score: np.ndarray | None = None
) -> np.ndarray:
    """Greedy NMS (chainercv semantics); returns kept indices.

    ``bbox`` is (N, 4) yxyx; with ``score`` given, boxes are visited in
    descending score order. Dispatches to the native C++ kernel
    (``loans_tpu/native``) when available; this python loop is the
    reference fallback.
    """
    from loans_tpu import native

    if native.get_lib() is not None:
        return native.nms(bbox, thresh, score)
    return _nms_python(bbox, thresh, score)


def _nms_python(
    bbox: np.ndarray, thresh: float, score: np.ndarray | None = None
) -> np.ndarray:
    """Pure-python reference NMS (fallback + test oracle)."""
    bbox = np.asarray(bbox, dtype=np.float64).reshape(-1, 4)
    if bbox.shape[0] == 0:
        return np.zeros((0,), dtype=np.int64)
    order = (
        np.asarray(score).reshape(-1).argsort()[::-1]
        if score is not None
        else np.arange(bbox.shape[0])
    )
    area = np.prod(bbox[:, 2:] - bbox[:, :2], axis=1)
    selected = []
    for i in order:
        b = bbox[i]
        keep = True
        for j in selected:
            tl = np.maximum(b[:2], bbox[j, :2])
            br = np.minimum(b[2:], bbox[j, 2:])
            inter = np.prod(np.clip(br - tl, 0, None)) * float(
                (br > tl).all()
            )
            union = area[i] + area[j] - inter
            if union > 0 and inter / union > thresh:
                keep = False
                break
        if keep:
            selected.append(i)
    return np.asarray(selected, dtype=np.int64)


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def postprocess_with_nms(
    predicted_bboxes: np.ndarray,
    objectness_scores: np.ndarray,
    score_threshold: float = 0.5,
    nms_thresh: float = 0.3,
):
    """Objectness-softmax gate + NMS (``evaluate.py:132-146``).

    ``objectness_scores`` is (N, 2) [not-object, object] logits per box.
    Returns (kept_bboxes, kept_scores).
    """
    probs = softmax(np.asarray(objectness_scores, dtype=np.float64), axis=-1)
    obj = probs[:, -1]
    mask = obj >= score_threshold
    boxes = np.asarray(predicted_bboxes).reshape(-1, 4)[mask]
    obj = obj[mask]
    keep = non_maximum_suppression(boxes, nms_thresh, score=obj)
    return boxes[keep], obj[keep]


class AccuracyAccumulator:
    """Streaming hit/miss + IoU bookkeeping (``evaluate.py:170-195``)."""

    def __init__(self, iou_threshold: float = 0.5):
        self.iou_threshold = iou_threshold
        self.hits = 0
        self.misses = 0
        self.n_images = 0
        self.ious: list[float] = []
        self.bad_ious: list[float] = []

    def add(self, pred_bboxes: np.ndarray, gt_bboxes: np.ndarray) -> float:
        """Score one image; returns its best IoU."""
        from loans_tpu.evaluation.voc import _bbox_iou

        pred = np.asarray(pred_bboxes, dtype=np.float64).reshape(-1, 4)
        gt = np.asarray(gt_bboxes, dtype=np.float64).reshape(-1, 4)
        self.n_images += 1
        if pred.shape[0] == 0 or gt.shape[0] == 0:
            self.misses += 1
            self.bad_ious.append(0.0)
            self.ious.append(0.0)
            return 0.0
        best = float(_bbox_iou(pred, gt).max())
        self.ious.append(best)
        if best >= self.iou_threshold:
            self.hits += 1
        else:
            self.misses += 1
            self.bad_ious.append(best)
        return best

    def summary(self) -> dict:
        precision = self.hits / max(self.n_images, 1)
        recall = self.hits / max(self.hits + self.misses, 1)
        h_mean = (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0
            else 0.0
        )
        return {
            "precision": precision,
            "recall": recall,
            "h_mean": h_mean,
            "mean_iou": float(np.mean(self.ious)) if self.ious else 0.0,
            "bad_iou_mean": (
                float(np.mean(self.bad_ious)) if self.bad_ious else 0.0
            ),
            "hits": self.hits,
            "misses": self.misses,
            "n_images": self.n_images,
        }
