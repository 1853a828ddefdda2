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


def test_map_evaluator_bn_warmup_changes_stats():
    """bn_warmup re-estimates BatchNorm stats before scoring: with an
    untrained net the warmed eval must differ from the unwarmed one
    (running stats start at init zeros/ones)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from loans_tpu.evaluation.intraining import MAPEvaluator
    from loans_tpu.models import Localizer
    from loans_tpu.ops import Size
    from loans_tpu.train import adam_amsgrad, create_train_state

    size = Size(32, 32)
    loc = Localizer(out_size=Size(8, 8), n_layers=18, input_size=size)
    state = create_train_state(
        loc, jax.random.key(0), jnp.zeros((2, 32, 32, 3)),
        adam_amsgrad(1e-3), train=False,
    )
    # the reference zero-weight head init makes theta feature-independent;
    # randomize it so BN stats can influence the prediction
    params = dict(state.params)
    head = dict(params["param_predictor"])
    head["kernel"] = (
        jax.random.normal(jax.random.key(1), head["kernel"].shape) * 0.05
    )
    params["param_predictor"] = head
    state = state.replace(params=params)
    rng = np.random.default_rng(0)
    batches = [
        (
            rng.uniform(size=(4, 32, 32, 3)).astype(np.float32),
            np.tile(np.array([4, 4, 20, 20], np.float32), (4, 1, 1)),
        )
        for _ in range(2)
    ]
    ev = MAPEvaluator(loc, size, bn_warmup=2)
    calls = []
    real_warm = ev._warm
    ev._warm = lambda st, imgs: calls.append(1) or real_warm(st, imgs)
    seen_stats = []
    real_step = ev._eval_step
    def spy_step(st, imgs):
        seen_stats.append(st.batch_stats)
        return real_step(st, imgs)
    ev._eval_step = spy_step
    warmed = ev(state, iter(batches))
    assert len(calls) == 2  # warm ran once per warmup batch
    # the eval forward ran with re-estimated (not snapshot) stats
    def a_stat(tree):
        return np.asarray(
            jax.tree_util.tree_leaves(tree)[0]
        )
    assert not np.array_equal(
        a_stat(seen_stats[0]), a_stat(state.batch_stats)
    )
    plain = MAPEvaluator(loc, size)(state, iter(batches))
    assert set(plain) == set(warmed)
