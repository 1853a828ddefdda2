"""In-training validation: mean IoU + VOC mAP on a held-out set.

Parity with ``sheep/sheep_evaluator.py`` (``SheepMAPEvaluator``): forward
the localizer in eval mode, turn the predicted affine params into
clipped axis-aligned boxes (``train_utils/match_bbox.py:46-67``
semantics via ``ops.geometry.corners_to_aabb``), report the mean of the
per-sample best IoU and chainercv-style VOC mAP.

TPU-first: the forward over the whole eval set runs as jitted
fixed-shape batches; only the ragged gt matching runs on host. Bounded
evaluation (``train_utils/train_utils.py:126-171`` ``FastEvaluator``) is
the ``max_batches`` argument.
"""

from __future__ import annotations

from typing import Iterable

import jax
import numpy as np

from loans_tpu.evaluation.metrics import AccuracyAccumulator
from loans_tpu.evaluation.voc import eval_detection_voc
from loans_tpu.ops.geometry import Size, corners_to_aabb, theta_corners
from loans_tpu.train.steps import make_eval_step


class MAPEvaluator:
    """Callable evaluator over a loader of (image, bbox, score) batches."""

    def __init__(
        self,
        localizer,
        image_size: Size,
        iou_thresh: float = 0.5,
        max_batches: int | None = None,
        assessor=None,
        bn_warmup: int = 0,
    ):
        """``bn_warmup`` > 0 re-estimates BatchNorm running stats from
        that many eval batches (train-mode forwards on a copy of the
        state) before scoring — early-run eval-mode predictions are
        otherwise degenerate because running stats lag (the offline
        sweep's ``--bn-warmup``; the reference has no equivalent, its
        evaluator inherits whatever stats the model has)."""
        self.image_size = image_size
        self.iou_thresh = iou_thresh
        self.max_batches = max_batches
        self.bn_warmup = bn_warmup
        self._eval_step = make_eval_step(localizer, image_size)
        from loans_tpu.train.steps import to_float01

        def warm(loc_state, images):
            _, upd = localizer.apply(
                {
                    "params": loc_state.params,
                    "batch_stats": loc_state.batch_stats,
                },
                to_float01(images), train=True, mutable=["batch_stats"],
                rngs={"rotation_dropout": jax.random.key(0)},
            )
            return upd["batch_stats"]

        self._warm = jax.jit(warm)
        self._boxes = jax.jit(
            lambda theta: corners_to_aabb(
                theta_corners(theta), image_size, clip=True
            )
        )
        self._scored_step = None
        if assessor is not None:
            # optional crop scoring (``evaluate.py:213-214``)
            from loans_tpu.train.steps import to_float01

            def scored(loc_state, ass_params, images):
                images = to_float01(images)
                rois, theta = localizer.apply(
                    {
                        "params": loc_state.params,
                        "batch_stats": loc_state.batch_stats,
                    },
                    images,
                    train=False,
                )
                score = assessor.apply({"params": ass_params}, rois)
                return theta, score[:, 0]

            self._scored_step = jax.jit(scored)

    def __call__(
        self, loc_state, batches: Iterable, ass_params=None
    ) -> dict:
        """``batches`` yields (images (N,H,W,3), gt_bboxes (N,R,4), ...).

        gt boxes are (y_min, x_min, y_max, x_max) pixels; rows of all
        zeros are padding. With ``ass_params`` set (and the evaluator
        built with an assessor), crops are also scored.
        """
        acc = AccuracyAccumulator(self.iou_thresh)
        pred_bb, pred_lb, pred_sc, gt_bb, gt_lb = [], [], [], [], []
        crop_scores = []
        if self.bn_warmup:
            batch_list = []
            for i, batch in enumerate(batches):
                if self.max_batches is not None and i >= self.max_batches:
                    break
                batch_list.append(batch)
            for batch in batch_list[: self.bn_warmup]:
                loc_state = loc_state.replace(
                    batch_stats=self._warm(loc_state, batch[0])
                )
            batches = batch_list
        for i, batch in enumerate(batches):
            if self.max_batches is not None and i >= self.max_batches:
                break
            images, gt = batch[0], batch[1]
            if self._scored_step is not None and ass_params is not None:
                theta, scores = self._scored_step(
                    loc_state, ass_params, images
                )
                crop_scores.extend(
                    np.asarray(jax.device_get(scores)).tolist()
                )
            else:
                theta = self._eval_step(loc_state, images)
            boxes = np.asarray(jax.device_get(self._boxes(theta)))
            gt = np.asarray(gt)
            for n in range(boxes.shape[0]):
                gt_n = gt[n].reshape(-1, 4)
                gt_n = gt_n[np.abs(gt_n).sum(axis=1) > 0]
                acc.add(boxes[n : n + 1], gt_n)
                pred_bb.append(boxes[n : n + 1])
                pred_lb.append(np.zeros(1, dtype=np.int64))
                pred_sc.append(np.ones(1, dtype=np.float64))
                gt_bb.append(gt_n)
                gt_lb.append(np.zeros(gt_n.shape[0], dtype=np.int64))
        if not pred_bb:
            return {"mean_iou": 0.0, "map": 0.0}
        voc = eval_detection_voc(
            pred_bb, pred_lb, pred_sc, gt_bb, gt_lb,
            iou_thresh=self.iou_thresh,
        )
        out = acc.summary()
        result = {
            "mean_iou": out["mean_iou"],
            "map": voc["map"],
            "ap/object": float(voc["ap"][0]) if len(voc["ap"]) else 0.0,
        }
        if crop_scores:
            result["mean_assessor_score"] = float(np.mean(crop_scores))
        return result
