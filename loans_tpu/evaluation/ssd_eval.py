"""SSD detection evaluation (``DetectionVOCEvaluator`` parity,
``schaaaafrichter/train.py:199-203`` and ``schaaaafrichter/evaluate.py``).

Jitted batched decode on device; per-image score-threshold + NMS +
VOC mAP on host.
"""

from __future__ import annotations

import jax
import numpy as np

from loans_tpu.evaluation.metrics import non_maximum_suppression
from loans_tpu.evaluation.voc import eval_detection_voc


class SSDEvaluator:
    def __init__(
        self,
        model,
        coder,
        score_thresh: float = 0.6,
        nms_thresh: float = 0.45,
        max_batches: int | None = None,
    ):
        from loans_tpu.train.ssd_steps import make_ssd_predict_step

        self.model = model
        self.coder = coder
        self.score_thresh = score_thresh
        self.nms_thresh = nms_thresh
        self.max_batches = max_batches
        self._predict = make_ssd_predict_step(model, coder)

    def detect(self, state, images):
        """One batch -> lists of (boxes pixels yxyx, labels, scores)."""
        size = self.model.input_size
        boxes, probs = jax.device_get(self._predict(state, images))
        out = []
        for n in range(boxes.shape[0]):
            per_img_b, per_img_l, per_img_s = [], [], []
            for cls in range(1, probs.shape[-1]):
                score = probs[n, :, cls]
                mask = score >= self.score_thresh
                b, s = boxes[n][mask], score[mask]
                keep = non_maximum_suppression(
                    b, self.nms_thresh, score=s
                )
                per_img_b.append(b[keep] * size)
                per_img_l.append(np.full(len(keep), cls - 1, np.int64))
                per_img_s.append(s[keep])
            out.append(
                (
                    np.concatenate(per_img_b, axis=0)
                    if per_img_b
                    else np.zeros((0, 4)),
                    np.concatenate(per_img_l),
                    np.concatenate(per_img_s),
                )
            )
        return out

    def __call__(self, state, batches) -> dict:
        """``batches`` yields (images, gt_bboxes (N,R,4) pixels, labels)."""
        pred_b, pred_l, pred_s, gt_b, gt_l = [], [], [], [], []
        for i, batch in enumerate(batches):
            if self.max_batches is not None and i >= self.max_batches:
                break
            images, gt = batch[0], batch[1]
            for (b, l, s), gt_n in zip(
                self.detect(state, images), np.asarray(gt)
            ):
                gt_n = gt_n.reshape(-1, 4)
                gt_n = gt_n[np.abs(gt_n).sum(axis=1) > 0]
                pred_b.append(b)
                pred_l.append(l)
                pred_s.append(s)
                gt_b.append(gt_n)
                gt_l.append(np.zeros(gt_n.shape[0], dtype=np.int64))
        if not pred_b:
            return {"map": 0.0}
        voc = eval_detection_voc(pred_b, pred_l, pred_s, gt_b, gt_l)
        return {"map": voc["map"]}
