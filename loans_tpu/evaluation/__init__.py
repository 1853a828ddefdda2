"""Evaluation: VOC detection mAP, IoU metrics, NMS, snapshot sweeps."""

from loans_tpu.evaluation.voc import (
    calc_detection_voc_ap,
    calc_detection_voc_prec_rec,
    eval_detection_voc,
)
from loans_tpu.evaluation.metrics import (
    AccuracyAccumulator,
    non_maximum_suppression,
    postprocess_with_nms,
)
from loans_tpu.evaluation.evaluator import EvalResults, Evaluator
from loans_tpu.evaluation.intraining import MAPEvaluator

__all__ = [
    "calc_detection_voc_ap",
    "calc_detection_voc_prec_rec",
    "eval_detection_voc",
    "AccuracyAccumulator",
    "non_maximum_suppression",
    "postprocess_with_nms",
    "EvalResults",
    "Evaluator",
    "MAPEvaluator",
]
