"""End-to-end CLI smoke tests: train -> evaluate -> infer on synthetic
data (the reference's MNIST quick-mode role, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_log_dir(tmp_path_factory):
    from loans_tpu.cli.train_localizer import main

    tmp = tmp_path_factory.mktemp("train")
    log_dir = main(
        [
            "synthetic:12",
            "synthetic:12",
            "synthetic:6",
            "--batch-size", "8",
            "--target-size", "32", "32",
            "--crop-size", "8", "8",
            "--n-layers", "18",
            "--iterations", "3",
            "--log-dir", str(tmp),
            "--log-interval", "3",
            "--snapshot-interval", "0",
            "--eval-batches", "1",
            "--plot-interval", "2",
            "--steps-per-call", "1",
        ]
    )
    return log_dir


def test_train_cli_artifacts(trained_log_dir):
    assert os.path.exists(os.path.join(trained_log_dir, "manifest.json"))
    log = json.load(open(os.path.join(trained_log_dir, "log")))
    assert log[0]["batch_size"] == 8  # config folded into first entry
    assert any("loss_localizer" in e for e in log)
    assert any("map" in e for e in log)  # in-training eval ran
    snaps = [
        f for f in os.listdir(trained_log_dir) if f.endswith(".msgpack")
    ]
    assert any(f.startswith("Localizer_") for f in snaps)
    assert any(f.startswith("ResnetAssessor_") for f in snaps)
    # BBoxPlotter ran at iteration 0 and 2
    assert os.path.exists(os.path.join(trained_log_dir, "bboxes", "0.png"))
    assert os.path.exists(os.path.join(trained_log_dir, "bboxes", "2.png"))


def test_evaluate_cli_sweep_and_resume(trained_log_dir, capsys):
    from loans_tpu.cli.evaluate import main

    results = main(
        ["synthetic:8", trained_log_dir, "--batch-size", "4"]
    )
    assert len(results.entries) >= 1
    assert "map" in results.entries[0]
    n = len(results.entries)
    # resume: nothing new to evaluate
    results2 = main(
        ["synthetic:8", trained_log_dir, "--batch-size", "4"]
    )
    assert len(results2.entries) == n
    assert os.path.exists(os.path.join(trained_log_dir, "plot.png"))


def test_inference_wrapper(trained_log_dir):
    from loans_tpu.inference import LocalizerInference

    loc = LocalizerInference(
        trained_log_dir, use_assessor=True, use_visual_backprop=True
    )
    image = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(
        np.float32
    )
    boxes, rois, scores, heat = loc.localize(image)
    assert boxes.shape == (1, 4)
    assert rois.shape[1:3] == (8, 8)
    assert heat is not None and heat.shape == (32, 32, 3)
    # visualize on a fake BGR frame
    frame = (image * 255).astype(np.uint8)
    out = loc.visualize_results(frame, boxes, scores)
    assert out.shape == frame.shape


def test_localize_batch_matches_single(trained_log_dir):
    """localize_batch is the TPU-native re-expression of the reference's
    frame-at-a-time video loop (video_sheeping.py:34-75) — same results,
    one dispatch."""
    from loans_tpu.inference import LocalizerInference

    loc = LocalizerInference(
        trained_log_dir, use_assessor=True, use_visual_backprop=True
    )
    rng = np.random.default_rng(3)
    imgs = [
        rng.uniform(size=(32, 32, 3)).astype(np.float32) for _ in range(3)
    ]
    singles = [loc.localize(im) for im in imgs]
    boxes, rois, scores, heats = loc.localize_batch(imgs)
    assert boxes.shape == (3, 1, 4) and scores.shape == (3,)
    for i, (sb, _sr, ss, sh) in enumerate(singles):
        np.testing.assert_allclose(boxes[i], sb, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(scores[i], ss, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(heats[i], sh)
    # async form: handle then finish
    handle = loc.localize_batch(imgs, sync=False)
    boxes2, _, scores2, _ = loc.finish_batch(handle)
    np.testing.assert_array_equal(boxes2, boxes)
    np.testing.assert_array_equal(scores2, scores)


def test_async_localizer(trained_log_dir):
    from loans_tpu.inference import AsynchronousLocalizer, LocalizerInference

    loc = LocalizerInference(trained_log_dir)
    worker = AsynchronousLocalizer(loc).start_localization_worker()
    try:
        image = np.zeros((32, 32, 3), dtype=np.float32)
        assert worker.submit(image)
        import time

        result = None
        for _ in range(100):
            result = worker.get_result()
            if result is not None:
                break
            time.sleep(0.1)
        assert result is not None
        boxes = result[0]
        assert boxes.shape == (1, 4)
    finally:
        worker.shutdown()


def test_supervised_train_cli(tmp_path):
    """--supervised mode: localizer regresses gt boxes directly."""
    from loans_tpu.cli.train_localizer import main

    log_dir = main(
        [
            "synthetic:16",
            "synthetic:4",
            "synthetic:8",
            "--supervised",
            "--batch-size", "8",
            "--target-size", "32", "32",
            "--crop-size", "8", "8",
            "--n-layers", "18",
            "--iterations", "3",
            "--log-dir", str(tmp_path),
            "--log-interval", "3",
            "--snapshot-interval", "0",
            "--eval-batches", "1",
        ]
    )
    log = json.load(open(os.path.join(log_dir, "log")))
    assert any("loss/box" in e for e in log)
    snaps = os.listdir(log_dir)
    assert any(f.startswith("Localizer_") for f in snaps)
    assert not any(f.startswith("ResnetAssessor_") for f in snaps)


def test_evaluate_cli_with_assessor(trained_log_dir):
    from loans_tpu.cli.evaluate import main

    results = main(
        ["synthetic:8", trained_log_dir, "--batch-size", "4",
         "--assessor", "--force-reset"]
    )
    assert any("mean_assessor_score" in e for e in results.entries)
    score = results.entries[0]["mean_assessor_score"]
    assert 0.0 <= score <= 1.0


def test_train_cli_lr_schedule(tmp_path):
    """--lr-shift drives the runtime LR without recompilation."""
    from loans_tpu.cli.train_localizer import main

    log_dir = main(
        [
            "synthetic:8", "synthetic:8", "synthetic:4",
            "--batch-size", "8",
            "--target-size", "32", "32",
            "--crop-size", "8", "8",
            "--n-layers", "18",
            "--iterations", "4",
            "--log-dir", str(tmp_path),
            "--log-interval", "2",
            "--snapshot-interval", "0",
            "--eval-batches", "0",
            "--steps-per-call", "1",
            "--lr-shift", "1e-3", "1e-5", "0", "4",
        ]
    )
    log = json.load(open(os.path.join(log_dir, "log")))
    lrs = [e["lr"] for e in log if "lr" in e]
    assert lrs[-1] < lrs[0]  # decayed toward target
    assert abs(lrs[-1] - 1e-5) < 1e-6


def test_train_cli_pooled_chunked_cadence(tmp_path):
    """Default device-data path: steps-per-call auto (8), intervals fire
    on crossings, snapshots land on chunk boundaries."""
    from loans_tpu.cli.train_localizer import main

    log_dir = main(
        [
            "synthetic:16", "synthetic:16", "synthetic:8",
            "--batch-size", "8",
            "--target-size", "32", "32",
            "--crop-size", "8", "8",
            "--n-layers", "18",
            "--iterations", "16",
            "--log-dir", str(tmp_path),
            "--log-interval", "8",
            "--snapshot-interval", "16",
            "--eval-batches", "1",
        ]
    )
    log = json.load(open(os.path.join(log_dir, "log")))
    iters = [e["iteration"] for e in log if "iteration" in e]
    assert iters == [8, 16]
    assert os.path.exists(os.path.join(log_dir, "Localizer_16.msgpack"))


def test_supervised_world_kwargs_match_val(monkeypatch):
    """--benchmark hard / --base-bboxes must reach the supervised TRAIN
    set, not only the val set (round-3 regression: supervised-hard
    trained on the default world and collapsed to val mAP 0.0008,
    docs/results/logs_r3/37_hard_sup.sh.out)."""
    from loans_tpu.cli.train_localizer import (
        build_supervised_datasets,
        get_parser,
    )
    from loans_tpu.data import synthetic as synth_mod

    captured = {}

    class Recorder:
        def __init__(self, n, **kw):
            captured.update(kw)
            self.items = []

    monkeypatch.setattr(synth_mod, "SyntheticLocalizerDataset", Recorder)
    args = get_parser().parse_args([
        "synthetic:4", "synthetic:4", "synthetic:4",
        "--supervised", "--benchmark", "hard",
        "--synthetic-assets", "8", "--seed", "5",
    ])
    train_ds, _ = build_supervised_datasets(args)
    assert isinstance(train_ds, Recorder)
    assert captured.get("hard") is True
    assert captured.get("asset_seed") == 5 + 9973
    assert captured.get("labeled") is True


def test_weak_refresh_world_kwargs_match(tmp_path, monkeypatch):
    """--benchmark hard must reach the REFRESHED assessor pools, not just
    the initial one (round-3 regression: hard-weak runs trained the
    assessor on hard crops until the first --assessor-refresh and on
    default-world crops after, collapsing at the first post-takeoff
    refresh — docs/results/logs_r3/36_hard_weak.sh.out)."""
    import loans_tpu.data as data_mod
    from loans_tpu.cli.train_localizer import main

    real = data_mod.SyntheticAssessorDataset
    calls = []

    def spy(n, **kw):
        calls.append(dict(kw))
        return real(n, **kw)

    monkeypatch.setattr(data_mod, "SyntheticAssessorDataset", spy)
    main(
        [
            "synthetic:8", "synthetic:8", "synthetic:4",
            "--batch-size", "8",
            "--target-size", "32", "32",
            "--crop-size", "8", "8",
            "--n-layers", "18",
            "--iterations", "16",
            "--steps-per-call", "8",
            "--assessor-refresh", "8",
            "--benchmark", "hard",
            "--synthetic-assets", "4",
            "--seed", "5",
            "--log-dir", str(tmp_path),
            "--log-interval", "8",
            "--snapshot-interval", "0",
            "--eval-batches", "0",
        ]
    )
    assert len(calls) >= 2, "expected initial + >=1 refreshed assessor pool"
    for kw in calls:
        assert kw.get("hard") is True
        assert kw.get("asset_seed") == 5 + 9973
