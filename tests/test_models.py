"""Model tests: shapes, head init, BN state, assessor output range."""

import numpy as np
import jax
import jax.numpy as jnp

from loans_tpu.models import Localizer, ResNet, ResnetAssessor
from loans_tpu.ops import Size, theta_corners


def test_resnet18_feature_shape():
    model = ResNet(18)
    x = jnp.zeros((2, 224, 224, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 7, 7, 512)


def test_resnet50_feature_shape():
    model = ResNet(50)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 7, 7, 2048)


def test_resnet_classifier_mode():
    model = ResNet(18, class_labels=10)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)


def test_localizer_initial_prediction_is_08_crop():
    """Zero head weights + [0.8,0,0,0,0.8,0] bias => every image starts
    as a centered 0.8-scale crop (sheep_localizer.py:28-33)."""
    model = Localizer(out_size=Size(16, 16), n_layers=18)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    rois, theta = model.apply(variables, x, train=False)
    assert rois.shape == (2, 16, 16, 3)
    expected = np.array([[0.8, 0.0, 0.0], [0.0, 0.8, 0.0]], np.float32)
    np.testing.assert_allclose(np.asarray(theta[0]), expected, atol=1e-5)
    corners = np.asarray(theta_corners(theta))
    np.testing.assert_allclose(corners[0, 0], [-0.8, -0.8], atol=1e-5)
    np.testing.assert_allclose(corners[0, 3], [0.8, 0.8], atol=1e-5)


def test_localizer_train_updates_batch_stats():
    model = Localizer(out_size=Size(8, 8), n_layers=18)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=(2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    (rois, theta), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )


def test_localizer_grayscale():
    model = Localizer(
        out_size=Size(8, 8), n_layers=18, transform_rois_to_grayscale=True
    )
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    variables = model.init(jax.random.key(0), x, train=False)
    rois, _ = model.apply(variables, x, train=False)
    assert rois.shape == (1, 8, 8, 1)


def test_localizer_res6_created_for_large_inputs():
    model = Localizer(
        out_size=Size(8, 8), n_layers=18, input_size=Size(256, 256)
    )
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    assert "res6" in variables["params"]
    assert "res7" not in variables["params"]


def test_assessor_output_in_unit_interval():
    model = ResnetAssessor()
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(4, 75, 100, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (4, 1)
    assert np.all(np.asarray(out) > 0.0) and np.all(np.asarray(out) < 1.0)


def test_assessor_spatial_dims():
    """75x100 crop -> 18x25 final feature map (matches chainer conv
    arithmetic for the 4x4/2 down-convs)."""
    model = ResnetAssessor(ch=8)
    x = jnp.zeros((1, 75, 100, 3))
    variables = model.init(jax.random.key(0), x)
    flat_dense = variables["params"]["Dense_0"]["kernel"]
    assert flat_dense.shape[0] == 18 * 25 * 8


def test_vbp_ladder_static_spec():
    model = Localizer(out_size=Size(8, 8), n_layers=18)
    ladder = model.vbp_ladder()
    kinds = [s[0] for s in ladder]
    assert kinds[0] == "conv" and kinds[1] == "pool"
    # stem(2) + 4 stages x 2 blocks x 2 convs = 18 steps
    assert len(ladder) == 18
