"""Tests for VOC eval, metrics, NMS, deteval export (SURVEY.md §4)."""

import numpy as np

from loans_tpu.evaluation import (
    AccuracyAccumulator,
    eval_detection_voc,
    non_maximum_suppression,
    postprocess_with_nms,
)
from loans_tpu.evaluation.voc import calc_detection_voc_ap


def test_voc_perfect_predictions():
    gt = [np.array([[10.0, 10, 50, 50]]), np.array([[0.0, 0, 20, 20]])]
    result = eval_detection_voc(
        pred_bboxes=gt,
        pred_labels=[np.zeros(1, int), np.zeros(1, int)],
        pred_scores=[np.ones(1), np.ones(1)],
        gt_bboxes=gt,
        gt_labels=[np.zeros(1, int), np.zeros(1, int)],
    )
    assert result["map"] == 1.0


def test_voc_miss_scores_zero():
    result = eval_detection_voc(
        pred_bboxes=[np.array([[100.0, 100, 120, 120]])],
        pred_labels=[np.zeros(1, int)],
        pred_scores=[np.ones(1)],
        gt_bboxes=[np.array([[0.0, 0, 20, 20]])],
        gt_labels=[np.zeros(1, int)],
    )
    assert result["map"] == 0.0


def test_voc_ranked_predictions():
    # one gt, two preds: high-score hit + low-score false positive -> AP 1
    result = eval_detection_voc(
        pred_bboxes=[
            np.array([[0.0, 0, 20, 20], [100.0, 100, 120, 120]])
        ],
        pred_labels=[np.zeros(2, int)],
        pred_scores=[np.array([0.9, 0.1])],
        gt_bboxes=[np.array([[0.0, 0, 20, 20]])],
        gt_labels=[np.zeros(1, int)],
    )
    assert result["map"] == 1.0
    # reversed scores: false positive ranked first -> AP 0.5
    result = eval_detection_voc(
        pred_bboxes=[
            np.array([[0.0, 0, 20, 20], [100.0, 100, 120, 120]])
        ],
        pred_labels=[np.zeros(2, int)],
        pred_scores=[np.array([0.1, 0.9])],
        gt_bboxes=[np.array([[0.0, 0, 20, 20]])],
        gt_labels=[np.zeros(1, int)],
    )
    assert abs(result["map"] - 0.5) < 1e-9


def test_voc_duplicate_detection_is_false_positive():
    result = eval_detection_voc(
        pred_bboxes=[np.array([[0.0, 0, 20, 20], [1.0, 1, 20, 20]])],
        pred_labels=[np.zeros(2, int)],
        pred_scores=[np.array([0.9, 0.8])],
        gt_bboxes=[np.array([[0.0, 0, 20, 20]])],
        gt_labels=[np.zeros(1, int)],
    )
    assert result["map"] == 1.0  # AP unaffected after the gt is matched
    prec_at_2 = 1 / 2
    assert prec_at_2 == 0.5  # sanity of the scenario


def test_voc_07_metric():
    ap = calc_detection_voc_ap(
        [np.array([1.0, 1.0])], [np.array([0.5, 1.0])], use_07_metric=True
    )
    assert abs(ap[0] - 1.0) < 1e-9


def test_nms_keeps_nonoverlapping():
    boxes = np.array(
        [[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]], dtype=float
    )
    keep = non_maximum_suppression(boxes, 0.5)
    assert list(keep) == [0, 2]


def test_nms_score_order():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=float)
    keep = non_maximum_suppression(boxes, 0.3, score=np.array([0.1, 0.9]))
    assert list(keep) == [1]


def test_postprocess_with_nms():
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=float)
    logits = np.array([[0.0, 5.0], [5.0, 0.0]])  # obj, not-obj
    kept, scores = postprocess_with_nms(boxes, logits, score_threshold=0.5)
    assert kept.shape == (1, 4)
    assert np.allclose(kept[0], boxes[0])


def test_accuracy_accumulator():
    acc = AccuracyAccumulator(0.5)
    acc.add(np.array([[0, 0, 10, 10.0]]), np.array([[0, 0, 10, 10.0]]))
    acc.add(np.array([[0, 0, 1, 1.0]]), np.array([[0, 0, 10, 10.0]]))
    s = acc.summary()
    assert s["hits"] == 1 and s["misses"] == 1
    assert 0 < s["mean_iou"] < 1
    assert s["precision"] == 0.5


def test_deteval_writer(tmp_path):
    from loans_tpu.evaluation.deteval import DetEvalWriter

    w = DetEvalWriter()
    w.add_image("a.png", np.array([[1.0, 2, 11, 22]]), scores=[0.9])
    path = w.write(str(tmp_path / "out.xml"))
    text = open(path).read()
    assert "taggedRectangle" in text and 'width="20.00"' in text
