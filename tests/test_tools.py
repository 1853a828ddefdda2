"""Tests for dataset tools, receptive fields, and extra loss calculators."""

import csv
import json
import os

import numpy as np
import pytest
from PIL import Image


def test_receptive_field_simple():
    from loans_tpu.utils.receptive_field import (
        bbox_to_feature_coords,
        calculate_receptive_fields,
    )

    # stem of a resnet: 7x7/2 pad 3 conv + 3x3/2 pool
    ladder = [("conv", 7, 2, 3), ("pool", 3, 2, 0)]
    rfs = calculate_receptive_fields(ladder)
    assert rfs[0].size == 7 and rfs[0].stride == 2
    assert rfs[1].size == 11 and rfs[1].stride == 4
    y1, x1, y2, x2 = bbox_to_feature_coords((0, 0, 64, 64), ladder)
    assert y2 - y1 == pytest.approx(16.0)


def test_resnet_ladder_receptive_field():
    from loans_tpu.models.resnet import resnet_vbp_ladder
    from loans_tpu.utils.receptive_field import calculate_receptive_fields

    rfs = calculate_receptive_fields(resnet_vbp_ladder(18))
    assert rfs[-1].stride == 32  # res5 total stride
    assert rfs[-1].size > 200  # resnet-18 RF covers a 224 input


def test_iou_losses():
    import jax.numpy as jnp

    from loans_tpu.ops.losses import iou_loss, smooth_iou_loss

    a = jnp.array([[0.0, 0, 10, 10]])
    assert float(iou_loss(a, a)) == pytest.approx(0.0)
    b = jnp.array([[100.0, 100, 110, 110]])
    assert float(iou_loss(a, b)) == pytest.approx(1.0)
    # smooth variant has nonzero gradient for nearby disjoint boxes
    # (the hard max(0, .) would give exactly zero)
    import jax

    c = jnp.array([[12.0, 12, 22, 22]])
    g_smooth = jax.grad(lambda p: smooth_iou_loss(p, c))(a)
    assert np.abs(np.asarray(g_smooth)).sum() > 0
    g_hard = jax.grad(lambda p: iou_loss(p, c))(a)
    assert np.abs(np.asarray(g_hard)).sum() == 0


def test_random_pairs():
    import jax

    from loans_tpu.ops.losses import random_pairs

    perm = np.asarray(random_pairs(jax.random.key(0), 16))
    assert sorted(perm.tolist()) == list(range(16))


def test_plot_log_cmd(tmp_path):
    from loans_tpu.cli.dataset_tools import main
    from loans_tpu.train.logger import MetricsLog

    log = MetricsLog(str(tmp_path), config={"x": 1})
    for i in (10, 20):
        log.append({"iteration": i, "loss": 1.0 / i})
    out = str(tmp_path / "curves.png")
    main(["plot_log", str(tmp_path), out])
    assert os.path.getsize(out) > 0


def test_convert_snapshot_cmd(tmp_path):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from loans_tpu.cli.dataset_tools import main
    from loans_tpu.models import ResnetAssessor
    from loans_tpu.train import adam_amsgrad, create_train_state, save_state

    state = create_train_state(
        ResnetAssessor(ch=4),
        jax.random.key(0),
        jnp.zeros((1, 8, 8, 3)),
        adam_amsgrad(1e-3),
    )
    full = str(tmp_path / "full.msgpack")
    save_state(full, state)
    out = str(tmp_path / "model.msgpack")
    main(["convert_snapshot", full, out])
    with open(out, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    assert set(payload) == {"params", "batch_stats"}
    assert os.path.getsize(out) < os.path.getsize(full)  # optimizer gone


def test_generate_scenes_cmd(tmp_path):
    from loans_tpu.cli.dataset_tools import main

    bg_path = str(tmp_path / "bg.png")
    Image.new("RGB", (64, 64), (10, 120, 10)).save(bg_path)
    stamp_path = str(tmp_path / "stamp.png")
    stamp = Image.new("RGBA", (16, 16), (200, 0, 0, 255))
    stamp.save(stamp_path)
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump(
            [{"image": bg_path, "bounding_boxes": [[8, 8, 24, 24]]}], f
        )
    dest = str(tmp_path / "gen")
    main([
        "generate_scenes", ann, dest, "--stamps", stamp_path,
        "--per-background", "5", "--test-fraction", "0.2",
    ])
    train = json.load(open(os.path.join(dest, "train_info.json")))
    test = json.load(open(os.path.join(dest, "test_info.json")))
    assert len(train) == 4 and len(test) == 1
    img = np.asarray(
        Image.open(os.path.join(dest, train[0]["image"].replace(
            "images/", dest + "/images/")))
        if False
        else Image.open(os.path.join(dest, train[0]["image"]))
    )
    assert (img[10, 10] == [200, 0, 0]).all()  # stamp pasted in the bbox


def test_paste_and_crop_cmd(tmp_path):
    from loans_tpu.cli.dataset_tools import main

    dest = str(tmp_path / "pc")
    main([
        "paste_and_crop", dest, "6",
        "--image-size", "64", "64", "--output-size", "16", "16",
    ])
    rows = list(
        csv.reader(open(os.path.join(dest, "images.csv")), delimiter="\t")
    )
    assert len(rows) == 6
    for path, label in rows:
        assert os.path.exists(os.path.join(dest, path))
        assert 0.0 <= float(label) <= 1.05


def test_average_snapshots_cmd(tmp_path):
    """SWA averaging: params/batch_stats are the arithmetic mean of the
    selected snapshots; step/opt_state come from the last one; the
    default output lands OUTSIDE the numbered-snapshot namespace (so it
    can never shadow the latest real snapshot) and only an explicit
    --out-iteration writes under an iteration number."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from loans_tpu.cli.dataset_tools import main
    from loans_tpu.models import ResnetAssessor
    from loans_tpu.train import adam_amsgrad, create_train_state, save_state
    from loans_tpu.train import checkpoint

    state = create_train_state(
        ResnetAssessor(ch=4),
        jax.random.key(0),
        jnp.zeros((1, 8, 8, 3)),
        adam_amsgrad(1e-3),
    )
    vals = (1.0, 3.0)
    for it, v in zip((100, 200), vals):
        scaled = state.replace(
            params=jax.tree_util.tree_map(
                lambda x: jnp.full_like(x, v), state.params
            ),
            step=it,
        )
        save_state(str(tmp_path / f"Assessor_{it}.msgpack"), scaled)
    main([
        "average_snapshots", str(tmp_path),
        "--prefix", "Assessor_", "--min-iteration", "100",
    ])
    # default name is outside the numbered namespace: lister unchanged
    assert (tmp_path / "Assessor_swa.msgpack").exists()
    snaps = checkpoint.list_snapshots(str(tmp_path), "Assessor_")
    assert [it for it, _ in snaps] == [100, 200]
    main([
        "average_snapshots", str(tmp_path),
        "--prefix", "Assessor_", "--min-iteration", "100",
        "--out-iteration", "201",
    ])
    snaps = checkpoint.list_snapshots(str(tmp_path), "Assessor_")
    assert [it for it, _ in snaps] == [100, 200, 201]
    with open(snaps[-1][1], "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    leaf = jax.tree_util.tree_leaves(raw["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf), 2.0)  # mean of 1 and 3
    assert int(raw["step"]) == 200  # last snapshot's bookkeeping kept
