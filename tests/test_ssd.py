"""Tests for the SSD baseline: default boxes, coder, loss, model, step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loans_tpu.models.ssd import SSD300, SSD512
from loans_tpu.ops.multibox import (
    MultiboxCoder,
    default_boxes,
    multibox_loss,
)


def test_default_box_count_ssd300():
    model = SSD300()
    assert model.default_bbox().shape == (8732, 4)  # canonical SSD300


def test_default_box_count_matches_head():
    for model, size in ((SSD300(), 300), (SSD512(), 512)):
        spec = model.spec
        n = 0
        for g, ars in zip(spec["grids"], spec["aspect_ratios"]):
            n += g * g * (2 + 2 * len(ars))
        assert model.default_bbox().shape[0] == n


def test_coder_encode_decode_roundtrip():
    coder = SSD300().coder()
    bbox = np.array([[0.2, 0.3, 0.6, 0.7]], dtype=np.float32)
    label = np.zeros(1, dtype=np.int32)
    loc, conf = coder.encode(bbox, label)
    assert loc.shape == (8732, 4) and conf.shape == (8732,)
    assert (conf > 0).sum() >= 1  # force-match guarantees >=1 positive
    # decoding the encoded offsets at positive anchors recovers the gt
    decoded = np.asarray(coder.decode_batch(jnp.asarray(loc[None])))[0]
    pos = conf > 0
    np.testing.assert_allclose(
        decoded[pos], np.tile(bbox, (pos.sum(), 1)), atol=1e-5
    )


def test_coder_empty_gt():
    coder = SSD300().coder()
    loc, conf = coder.encode(np.zeros((0, 4), np.float32), np.zeros(0))
    assert (conf == 0).all() and (loc == 0).all()


def test_multibox_loss_properties():
    K, C = 64, 2
    rng = np.random.default_rng(0)
    gt_conf = np.zeros((2, K), np.int32)
    gt_conf[:, :4] = 1
    gt_loc = rng.normal(size=(2, K, 4)).astype(np.float32)
    # perfect loc predictions -> zero loc loss
    loc_loss, conf_loss = multibox_loss(
        jnp.asarray(gt_loc),
        jnp.asarray(rng.normal(size=(2, K, C + 1)).astype(np.float32)),
        jnp.asarray(gt_loc),
        jnp.asarray(gt_conf),
    )
    assert float(loc_loss) == 0.0
    assert float(conf_loss) > 0.0
    # hard negative mining: k=3 negatives per positive participate
    logits = np.zeros((2, K, C + 1), np.float32)
    _, conf_uniform = multibox_loss(
        jnp.zeros((2, K, 4)),
        jnp.asarray(logits),
        jnp.zeros((2, K, 4)),
        jnp.asarray(gt_conf),
        k=3,
    )
    expected = np.log(C + 1)  # uniform CE, (1+k) * n_pos terms / n_pos
    assert abs(float(conf_uniform) / 4 - expected) < 1e-5


def test_ssd300_forward_shapes():
    model = SSD300(n_fg_class=1)
    x = jnp.zeros((1, 300, 300, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    mb_loc, mb_conf = model.apply(variables, x, train=False)
    assert mb_loc.shape == (1, 8732, 4)
    assert mb_conf.shape == (1, 8732, 2)


def test_ssd_train_step_runs():
    from loans_tpu.train import create_train_state
    from loans_tpu.train.ssd_steps import (
        make_ssd_train_step,
        ssd_optimizer,
    )

    model = SSD300(n_fg_class=1)
    state = create_train_state(
        model,
        jax.random.key(0),
        jnp.zeros((1, 300, 300, 3)),
        ssd_optimizer(1e-4),
        train=False,
    )
    coder = model.coder()
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(2, 300, 300, 3)).astype(np.float32)
    locs, confs = [], []
    for _ in range(2):
        loc, conf = coder.encode(
            np.array([[0.2, 0.2, 0.8, 0.8]], np.float32), np.zeros(1)
        )
        locs.append(loc)
        confs.append(conf)
    batch = (
        jnp.asarray(images),
        jnp.asarray(np.stack(locs)),
        jnp.asarray(np.stack(confs)),
    )
    step = make_ssd_train_step(model)
    state2, _, metrics = step(state, None, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_ssd_evaluator_perfect_model():
    """A detector whose logits are painted from gt should get mAP 1."""
    from loans_tpu.evaluation.ssd_eval import SSDEvaluator

    model = SSD300(n_fg_class=1)
    coder = model.coder()

    class FakeState:
        params = {}

    class FakeModel:
        input_size = 300

        def apply(self, variables, images, train=False):
            n = images.shape[0]
            loc, conf = coder.encode(
                np.array([[0.2, 0.2, 0.6, 0.6]], np.float32), np.zeros(1)
            )
            logits = np.zeros((n, conf.shape[0], 2), np.float32)
            logits[:, conf > 0, 1] = 10.0
            logits[:, conf == 0, 0] = 10.0
            return (
                jnp.asarray(np.tile(loc[None], (n, 1, 1))),
                jnp.asarray(logits),
            )

    fake = FakeModel()
    ev = SSDEvaluator(fake, coder)

    def fake_predict(state, images):
        mb_loc, mb_conf = fake.apply({}, images)
        return coder.decode_batch(mb_loc), jax.nn.softmax(mb_conf, -1)

    # bypass the jitted path: FakeState isn't a registered pytree
    ev._predict = fake_predict
    gt = np.array([[[60.0, 60, 180, 180]]], np.float32)  # 0.2*300 etc
    images = np.zeros((1, 300, 300, 3), np.float32)
    result = ev(FakeState(), [(images, gt)])
    assert result["map"] == 1.0


@pytest.mark.slow
def test_ssd_train_cli_smoke(tmp_path):
    """End-to-end supervised SSD training on synthetic scenes."""
    from loans_tpu.cli.train_ssd import main

    log_dir = main([
        "synthetic:8", "synthetic:4",
        "--batch-size", "8", "--iterations", "2",
        "--log-interval", "2", "--snapshot-interval", "0",
        "--eval-interval", "2", "--eval-batches", "1",
        "--plot-interval", "2",
        "--log-dir", str(tmp_path),
    ])
    import json
    import os

    log = json.load(open(os.path.join(log_dir, "log")))
    assert any("loss" in e for e in log)
    assert any("map" in e for e in log)
    assert os.path.exists(os.path.join(log_dir, "bboxes", "2.png"))
    snaps = [f for f in os.listdir(log_dir) if f.startswith("SSD300_")]
    assert snaps
