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


def test_pooled_scan_data_path_exact():
    """The on-device gather inside the scan delivers exactly the batches
    the index streams name: a deterministic probe body records per-field
    sums, compared against host gathers. Catches wrong indexing, group
    merging, field pairing, and scan/batch-axis mixups bit-for-bit
    (independent of optimizer fp chaos)."""
    from loans_tpu.data.device_data import device_chunk_batches
    from loans_tpu.train import make_pooled_train_step

    K = 4

    def probe_body(loc, ass, batch, rng):
        metrics = {
            "sum_unlabeled": jnp.sum(batch["unlabeled"]),
            "sum_real": jnp.sum(batch["real"]),
            "sum_labels": jnp.sum(batch["labels"]),
            "rng_bit": jax.random.uniform(rng),
        }
        return loc + 1, ass, metrics

    step = make_pooled_train_step(probe_body, K)
    mesh = create_mesh()
    gen = np.random.default_rng(0)
    scenes = gen.uniform(size=(32, 4, 4, 3)).astype("f")
    crops = gen.uniform(size=(48, 2, 2, 3)).astype("f")
    labels = gen.uniform(size=(48, 1)).astype("f")
    groups = {
        "unlabeled": {"unlabeled": scenes},
        "reference": {"real": crops, "labels": labels},
    }
    chunks = device_chunk_batches(mesh, groups, BATCH, K, seed=0)
    chunk = next(chunks)
    counter, _, metrics = step(jnp.zeros(()), None, chunk, jax.random.key(7))
    assert int(counter) == K  # carry threads through all K steps

    idx = {g: np.asarray(chunk["idx"][g]) for g in chunk["idx"]}
    # epoch-permutation semantics: no repeats inside one epoch
    # (pool of 32, batch 16 -> one epoch = the first 2 steps)
    epoch = idx["unlabeled"][:2].ravel()
    assert len(set(epoch.tolist())) == len(epoch)
    exp_unlabeled = np.mean(
        [scenes[idx["unlabeled"][t]].sum() for t in range(K)]
    )
    exp_real = np.mean([crops[idx["reference"][t]].sum() for t in range(K)])
    exp_labels = np.mean(
        [labels[idx["reference"][t]].sum() for t in range(K)]
    )
    np.testing.assert_allclose(
        float(metrics["sum_unlabeled"]), exp_unlabeled, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["sum_real"]), exp_real, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["sum_labels"]), exp_labels, rtol=1e-5
    )


def test_pooled_scan_step_trains_real_models():
    """Integration: K scanned alternating iterations on the real
    localizer/assessor advance the states and track a plain-step replay.
    (Exact trajectory equality across different XLA programs is not a
    contract — Adam amplifies float32 reassociation noise — so the
    comparison is loose; the data path is verified exactly in
    ``test_pooled_scan_data_path_exact``.)"""
    from loans_tpu.data.device_data import device_chunk_batches
    from loans_tpu.train import alternating_step_body, make_pooled_train_step

    localizer, assessor, loc_state, ass_state = build_states()
    body = alternating_step_body(
        localizer, assessor, AlternatingConfig(image_size=IMG)
    )
    K = 3
    step = make_pooled_train_step(body, K)

    mesh = create_mesh()
    gen = np.random.default_rng(0)
    scenes = gen.uniform(size=(32, IMG.height, IMG.width, 3)).astype("f")
    crops = gen.uniform(size=(48, CROP.height, CROP.width, 3)).astype("f")
    labels = gen.uniform(size=(48, 1)).astype("f")
    groups = {
        "unlabeled": {"unlabeled": scenes},
        "reference": {"real": crops, "labels": labels},
    }
    chunks = device_chunk_batches(mesh, groups, BATCH, K, seed=0)
    chunk = next(chunks)

    rng = jax.random.key(7)
    # real copies: the pooled step donates its input states
    loc2, ass2 = jax.tree_util.tree_map(
        lambda x: jnp.array(x), (loc_state, ass_state)
    )
    loc_p, ass_p, metrics = step(loc_state, ass_state, chunk, rng)
    assert int(loc_p.step) == K
    for k in ("loss_localizer", "loss_dis", "y_fake_mean"):
        assert np.isfinite(float(metrics[k]))

    # replay the same K batches through the single step
    plain = jax.jit(body)
    idx = {g: np.asarray(chunk["idx"][g]) for g in chunk["idx"]}
    rngs = jax.random.split(rng, K)
    for t in range(K):
        b = {
            "unlabeled": scenes[idx["unlabeled"][t]],
            "real": crops[idx["reference"][t]],
            "labels": labels[idx["reference"][t]],
        }
        loc2, ass2, m2 = plain(loc2, ass2, b, rngs[t])
    pooled_bias = np.asarray(loc_p.params["param_predictor"]["bias"])
    replay_bias = np.asarray(loc2.params["param_predictor"]["bias"])
    init_bias = np.array([0.8, 0.0, 0.0, 0.0, 0.8, 0.0], dtype=np.float32)
    # both trained: moved off init, in the same direction, similar size
    assert not np.allclose(pooled_bias, init_bias)
    np.testing.assert_allclose(pooled_bias, replay_bias, atol=2e-3)


def test_trainer_span_triggers_with_pooled_step():
    """log/snapshot/hook intervals fire on crossings when the trainer
    advances steps_per_call iterations per call."""
    from loans_tpu.train.loop import Hook, _crossed

    assert _crossed(0, 4, 4) and not _crossed(4, 7, 4) and _crossed(7, 8, 4)
    h = Hook(lambda t, i: None, every=10)
    assert h.due_span(9, 12) and not h.due_span(10, 19) and h.due_span(19, 20)


def test_assessor_ema_smooths_scoring():
    """--assessor-ema: the localizer is scored against an EMA of the
    assessor params; the EMA trails the live params and both nets still
    train."""
    localizer, assessor, loc_state, ass_state = build_states()
    ass_state = ass_state.with_ema()
    step = make_train_step(
        localizer,
        assessor,
        AlternatingConfig(image_size=IMG, assessor_ema=0.9),
    )
    batch = make_batch()
    for i in range(3):
        loc_state, ass_state, metrics = step(
            loc_state, ass_state, batch, jax.random.key(i)
        )
    live = jax.tree_util.tree_leaves(ass_state.params)[0]
    ema = jax.tree_util.tree_leaves(ass_state.ema_params)[0]
    # EMA moved off the init but trails the live params.
    assert not np.allclose(np.asarray(ema), np.asarray(live))
    assert np.isfinite(float(metrics["loss_localizer"]))
    # The scoring surface actually differs: the assessor scores a fixed
    # crop batch differently under ema vs live params.
    rois = jnp.asarray(make_batch(3)["real"])
    y_ema = assessor.apply({"params": ass_state.ema_params}, rois)
    y_live = assessor.apply({"params": ass_state.params}, rois)
    assert not np.allclose(np.asarray(y_ema), np.asarray(y_live))


def test_assessor_ema_delayed_start():
    """--assessor-ema-start: before the start iteration the shadow
    params are pinned exactly to the live params (scoring == reference
    behavior); from the start iteration on the EMA accumulates and
    trails."""
    localizer, assessor, loc_state, ass_state = build_states()
    ass_state = ass_state.with_ema()
    step = make_train_step(
        localizer,
        assessor,
        AlternatingConfig(
            image_size=IMG, assessor_ema=0.9, assessor_ema_start=3
        ),
    )
    batch = make_batch()

    def leaves_equal(state):
        return all(
            np.array_equal(np.asarray(e), np.asarray(p))
            for e, p in zip(
                jax.tree_util.tree_leaves(state.ema_params),
                jax.tree_util.tree_leaves(state.params),
            )
        )

    for i in range(2):  # post-update step counter reaches 1, 2 (< 3)
        loc_state, ass_state, _ = step(
            loc_state, ass_state, batch, jax.random.key(i)
        )
        assert leaves_equal(ass_state), f"shadow diverged at step {i}"
    for i in range(2, 4):  # counter 3, 4 (>= 3): EMA active
        loc_state, ass_state, _ = step(
            loc_state, ass_state, batch, jax.random.key(i)
        )
    assert not leaves_equal(ass_state)
    # dtype of the shadow leaves is unchanged by the traced decay
    for e, p in zip(
        jax.tree_util.tree_leaves(ass_state.ema_params),
        jax.tree_util.tree_leaves(ass_state.params),
    ):
        assert e.dtype == p.dtype
