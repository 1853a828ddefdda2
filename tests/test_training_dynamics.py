"""Regression tests for training-dynamics failure modes.

The assessor head over a wide relu flatten can swing its logit by
~lr * sum|h| per Adam step (all-positive features push every weight the
same way); without the 1/sqrt(fan_in) feature scaling this saturates the
sigmoid in one update and amsgrad keeps it dead forever
(y -> exactly 0, loss_dis flat at E[label^2]).
"""

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.models import ResnetAssessor
from loans_tpu.train import adam_amsgrad, create_train_state, to_float01


def test_assessor_survives_adverse_adam_steps():
    # moderately wide head: 8x8 x 64ch flatten = 4096 features
    assessor = ResnetAssessor(ch=64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(16, 32, 32, 3)).astype("f"))
    state = create_train_state(
        assessor, jax.random.key(0), x[:2], adam_amsgrad(1e-3)
    )
    out0 = assessor.apply({"params": state.params}, x)
    assert 0.3 < float(out0.mean()) < 0.7  # starts near sigmoid midpoint

    # adversarial: every sample demands the output go DOWN, hard
    target = jnp.zeros((16, 1))

    @jax.jit
    def step(state):
        def loss(p):
            return jnp.mean((assessor.apply({"params": p}, x) - target) ** 2)

        _, grads = jax.value_and_grad(loss)(state.params)
        return state.apply_gradients(grads)

    for _ in range(5):
        state = step(state)
    out = assessor.apply({"params": state.params}, x)
    # must move toward 0 but NOT saturate to numerically-dead values
    assert float(out.mean()) < float(out0.mean())
    assert float(out.min()) > 1e-4, "sigmoid saturated — head swing too large"


def test_to_float01_uint8_equivalence():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    f = u8.astype(np.float32) / 255.0
    np.testing.assert_allclose(
        np.asarray(to_float01(jnp.asarray(u8))), f, atol=1e-7
    )
    # float input passes through untouched
    np.testing.assert_allclose(
        np.asarray(to_float01(jnp.asarray(f))), f
    )


def test_train_step_uint8_matches_float(tiny=True):
    from loans_tpu.models import Localizer
    from loans_tpu.ops import Size
    from loans_tpu.train import AlternatingConfig, make_train_step

    img, crop = Size(32, 32), Size(8, 8)
    localizer = Localizer(out_size=crop, n_layers=18, input_size=img)
    assessor = ResnetAssessor(ch=4)
    rng = jax.random.key(0)
    loc = create_train_state(
        localizer, rng, jnp.zeros((1, 32, 32, 3)), adam_amsgrad(1e-3),
        train=False,
    )
    ass = create_train_state(
        assessor, rng, jnp.zeros((1, 8, 8, 3)), adam_amsgrad(1e-3)
    )
    g = np.random.default_rng(0)
    real_u8 = g.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
    unl_u8 = g.integers(0, 256, size=(4, 32, 32, 3), dtype=np.uint8)
    labels = g.uniform(size=(4, 1)).astype("f")
    step = make_train_step(localizer, assessor, AlternatingConfig(image_size=img))
    u8_batch = {"real": real_u8, "labels": labels, "unlabeled": unl_u8}
    f_batch = {
        "real": real_u8.astype(np.float32) / 255.0,
        "labels": labels,
        "unlabeled": unl_u8.astype(np.float32) / 255.0,
    }
    _, _, m_u8 = step(loc, ass, u8_batch, jax.random.key(1))
    # fresh states (donated)
    loc2 = create_train_state(
        localizer, rng, jnp.zeros((1, 32, 32, 3)), adam_amsgrad(1e-3),
        train=False,
    )
    ass2 = create_train_state(
        assessor, rng, jnp.zeros((1, 8, 8, 3)), adam_amsgrad(1e-3)
    )
    _, _, m_f = step(loc2, ass2, f_batch, jax.random.key(1))
    np.testing.assert_allclose(
        float(m_u8["loss_localizer"]), float(m_f["loss_localizer"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(m_u8["loss_dis"]), float(m_f["loss_dis"]), rtol=1e-5
    )
