"""Tests for checkpointing, logging, control, and the Trainer loop."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loans_tpu.models import Localizer, ResnetAssessor
from loans_tpu.ops import Size
from loans_tpu.train import (
    AlternatingConfig,
    CommandChannel,
    Hook,
    MetricsLog,
    Trainer,
    adam_amsgrad,
    create_train_state,
    list_snapshots,
    make_train_step,
    restore_params,
    restore_state,
    save_params,
    save_state,
    two_state_lr_shifter,
)
from loans_tpu.utils import build_model

IMG = Size(32, 32)
CROP = Size(8, 8)


def tiny_states(seed=0):
    localizer = Localizer(out_size=CROP, n_layers=18, input_size=IMG)
    assessor = ResnetAssessor(ch=4)
    rng = jax.random.key(seed)
    loc = create_train_state(
        localizer,
        rng,
        jnp.zeros((1, IMG.height, IMG.width, 3)),
        adam_amsgrad(1e-3),
        train=False,
    )
    ass = create_train_state(
        assessor,
        rng,
        jnp.zeros((1, CROP.height, CROP.width, 3)),
        adam_amsgrad(1e-3),
    )
    return localizer, assessor, loc, ass


def batches(n, batch=4):
    rng = np.random.default_rng(0)
    for _ in range(n):
        yield {
            "real": rng.uniform(size=(batch, CROP.height, CROP.width, 3)).astype(
                np.float32
            ),
            "labels": rng.uniform(size=(batch, 1)).astype(np.float32),
            "unlabeled": rng.uniform(
                size=(batch, IMG.height, IMG.width, 3)
            ).astype(np.float32),
        }


def test_state_checkpoint_roundtrip(tmp_path):
    _, _, loc, _ = tiny_states()
    path = save_state(str(tmp_path / "Localizer_0.msgpack"), loc)
    # perturb, then restore
    perturbed = loc.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, loc.params)
    )
    restored = restore_state(path, perturbed)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(loc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_partial_restore_skips_prefix(tmp_path):
    _, _, loc, _ = tiny_states(0)
    path = save_params(
        str(tmp_path / "m.msgpack"), loc.params, loc.batch_stats
    )
    _, _, loc2, _ = tiny_states(1)
    head_before = np.asarray(loc2.params["param_predictor"]["kernel"]).copy()
    params, stats = restore_params(
        path,
        loc2.params,
        loc2.batch_stats,
        skip_prefixes=("param_predictor",),
    )
    np.testing.assert_allclose(
        np.asarray(params["param_predictor"]["kernel"]), head_before
    )
    # every backbone leaf must match the SAVED model exactly
    for (path_a, a), (path_b, b) in zip(
        jax.tree_util.tree_leaves_with_path(loc.params["feature_extractor"]),
        jax.tree_util.tree_leaves_with_path(params["feature_extractor"]),
    ):
        assert path_a == path_b
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_metrics_log_config_first_entry(tmp_path):
    log = MetricsLog(str(tmp_path), config={"batch_size": 16})
    log.append({"loss": 1.0, "iteration": 10})
    log.append({"loss": 0.5, "iteration": 20})
    entries = MetricsLog.read(str(tmp_path))
    assert entries[0]["batch_size"] == 16
    assert "batch_size" not in entries[1]
    assert MetricsLog.read_config(str(tmp_path))["batch_size"] == 16


def test_trainer_end_to_end(tmp_path):
    localizer, assessor, loc, ass = tiny_states()
    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    seen = []
    trainer = Trainer(
        step,
        loc,
        ass,
        batches(6),
        str(tmp_path / "run"),
        max_iterations=6,
        rng=jax.random.key(0),
        config={"experiment": "test"},
        snapshot_interval=3,
        log_interval=2,
        hooks=[Hook(lambda t, i: seen.append(i), every=2)],
    )
    trainer.run()
    assert trainer.iteration == 6
    assert seen == [2, 4, 6]
    entries = MetricsLog.read(str(tmp_path / "run"))
    assert entries[0]["experiment"] == "test"
    assert any("loss_localizer" in e for e in entries)
    snaps = list_snapshots(str(tmp_path / "run"), "Localizer_")
    assert [it for it, _ in snaps] == [3, 6]


def test_trainer_resume(tmp_path):
    localizer, assessor, loc, ass = tiny_states()
    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    log_dir = str(tmp_path / "run")
    t1 = Trainer(
        step, loc, ass, batches(3), log_dir, 3, jax.random.key(0),
        log_interval=0,
    )
    t1.run()
    snaps = list_snapshots(log_dir, "Localizer_")
    # fresh states: the jitted step DONATES its inputs, so t1's
    # originals are dead buffers after run()
    _, _, loc2, ass2 = tiny_states()
    t2 = Trainer(
        step, loc2, ass2, batches(3), log_dir, 6, jax.random.key(0),
        log_interval=0,
    )
    t2.resume(loc_path=snaps[-1][1])
    assert t2.iteration == 3
    t2.run()
    assert t2.iteration == 6


def test_trainer_resume_at_or_beyond_total_iterations_fails(tmp_path):
    """--iterations is TOTAL: resuming a snapshot already at/beyond it
    would train zero steps — must fail loudly instead of silently
    re-evaluating (the round-3 38a joint-fine-tune no-op)."""
    import pytest

    localizer, assessor, loc, ass = tiny_states()
    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    log_dir = str(tmp_path / "run")
    t1 = Trainer(
        step, loc, ass, batches(3), log_dir, 3, jax.random.key(0),
        log_interval=0,
    )
    t1.run()
    snaps = list_snapshots(log_dir, "Localizer_")
    _, _, loc2, ass2 = tiny_states()
    t2 = Trainer(
        step, loc2, ass2, batches(3), log_dir, 3, jax.random.key(0),
        log_interval=0,
    )
    with pytest.raises(SystemExit, match="TOTAL"):
        t2.resume(loc_path=snaps[-1][1])


def test_lr_control_via_file(tmp_path):
    localizer, assessor, loc, ass = tiny_states()
    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    log_dir = str(tmp_path / "run")
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "control"), "w") as f:
        f.write("shiftlr 0.1\n")
    trainer = Trainer(
        step, loc, ass, batches(2), log_dir, 2, jax.random.key(0),
        log_interval=0, control=CommandChannel(log_dir),
    )
    trainer.run()
    lr = float(jax.device_get(trainer.loc_state.learning_rate))
    assert abs(lr - 1e-4) < 1e-9


def test_lr_schedule():
    sched = two_state_lr_shifter(1e-3, 1e-5, 10, 20)
    assert sched(5) is None
    assert abs(sched(15) - (1e-3 + 0.5 * (1e-5 - 1e-3))) < 1e-12
    assert sched(25) == 1e-5


def test_registry_build_model():
    m = build_model(
        "Localizer", out_size=[8, 8], n_layers=18, input_size=[32, 32]
    )
    assert isinstance(m, Localizer)
    assert m.out_size == Size(8, 8)
    with pytest.raises(KeyError):
        build_model("NoSuchModel")
