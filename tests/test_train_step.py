"""Integration test: the alternating train step on an 8-device CPU mesh
with tiny networks (SURVEY.md §4 test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from loans_tpu.models import Localizer, ResnetAssessor
from loans_tpu.ops import Size
from loans_tpu.parallel import create_mesh, replicate, shard_batch
from loans_tpu.train import (
    AlternatingConfig,
    adam_amsgrad,
    create_train_state,
    make_train_step,
)

IMG = Size(64, 64)
CROP = Size(16, 16)
BATCH = 16


def build_states(seed=0):
    localizer = Localizer(out_size=CROP, n_layers=18, input_size=IMG)
    assessor = ResnetAssessor(ch=8)
    rng = jax.random.key(seed)
    loc_state = create_train_state(
        localizer,
        rng,
        jnp.zeros((2, IMG.height, IMG.width, 3)),
        adam_amsgrad(1e-3),
        train=False,
    )
    ass_state = create_train_state(
        assessor,
        rng,
        jnp.zeros((2, CROP.height, CROP.width, 3)),
        adam_amsgrad(1e-3),
    )
    return localizer, assessor, loc_state, ass_state


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "real": rng.uniform(size=(BATCH, CROP.height, CROP.width, 3)).astype(
            np.float32
        ),
        "labels": rng.uniform(size=(BATCH, 1)).astype(np.float32),
        "unlabeled": rng.uniform(
            size=(BATCH, IMG.height, IMG.width, 3)
        ).astype(np.float32),
    }


def test_alternating_step_runs_and_updates():
    localizer, assessor, loc_state, ass_state = build_states()
    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    # The zero-init head blocks backbone grads on step 1 (by design, as
    # in the reference); the head itself must move immediately.
    p0 = np.asarray(loc_state.params["param_predictor"]["kernel"]).copy()
    a0 = jax.tree_util.tree_leaves(ass_state.params)[0].copy()
    batch = make_batch()
    loc_state, ass_state, metrics = step(
        loc_state, ass_state, batch, jax.random.key(1)
    )
    assert int(loc_state.step) == 1
    assert int(ass_state.step) == 1
    assert np.isfinite(float(metrics["loss_localizer"]))
    assert np.isfinite(float(metrics["loss_dis"]))
    assert not np.allclose(
        np.asarray(loc_state.params["param_predictor"]["kernel"]), p0
    )
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(ass_state.params)[0]), a0
    )


def test_freeze_assessor_keeps_params():
    localizer, assessor, loc_state, ass_state = build_states()
    step = make_train_step(
        localizer,
        assessor,
        AlternatingConfig(image_size=IMG, freeze_assessor=True),
    )
    a0 = np.asarray(jax.tree_util.tree_leaves(ass_state.params)[0]).copy()
    loc_state, ass_state, metrics = step(
        loc_state, ass_state, make_batch(), jax.random.key(1)
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(ass_state.params)[0]), a0
    )
    assert np.isfinite(float(metrics["loss_dis"]))


def test_assessor_loss_decreases_supervised():
    """The assessor must be able to fit IoU labels (the supervised half
    of the algorithm)."""
    localizer, assessor, loc_state, ass_state = build_states()
    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    batch = make_batch()
    losses = []
    for i in range(12):
        loc_state, ass_state, metrics = step(
            loc_state, ass_state, batch, jax.random.key(i)
        )
        losses.append(float(metrics["loss_dis"]))
    assert losses[-1] < losses[0]


def test_train_step_on_8_device_mesh():
    mesh = create_mesh()
    assert len(mesh.devices.flat) == 8
    localizer, assessor, loc_state, ass_state = build_states()
    step = make_train_step(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    loc_state = replicate(mesh, loc_state)
    ass_state = replicate(mesh, ass_state)
    batch = shard_batch(mesh, make_batch())
    loc_state, ass_state, metrics = step(
        loc_state, ass_state, batch, jax.random.key(1)
    )
    assert np.isfinite(float(metrics["loss_localizer"]))
    # Params stay replicated after the step.
    leaf = jax.tree_util.tree_leaves(loc_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_learning_rate_runtime_shift():
    """Parity with the interactive `shiftlr` command."""
    _, _, loc_state, _ = build_states()
    np.testing.assert_allclose(float(loc_state.learning_rate), 1e-3, rtol=1e-6)
    shifted = loc_state.with_learning_rate(float(loc_state.learning_rate) * 0.1)
    np.testing.assert_allclose(float(shifted.learning_rate), 1e-4, rtol=1e-6)
