"""Regularizer loss tests against hand-computed values (reference
semantics from common/utils.py)."""

import numpy as np
import jax.numpy as jnp

from loans_tpu.ops import (
    Size,
    aspect_ratio_loss,
    direction_loss,
    max_area_loss,
    min_area_loss,
    out_of_image_loss,
    rotation_dropout,
    theta_corners,
    transform_param_regression_loss,
)


def make_theta(sx, sy, tx=0.0, ty=0.0):
    return np.array(
        [[[sx, 0.0, tx], [0.0, sy, ty]]], dtype=np.float32
    )


def test_direction_loss_zero_for_upright():
    corners = theta_corners(make_theta(0.8, 0.8))
    assert float(direction_loss(corners, Size(100, 100))) == 0.0


def test_direction_loss_penalizes_flip():
    # Negative y scale -> upside down: tl_y > bl_y.
    corners = theta_corners(make_theta(0.8, -0.8))
    loss = float(direction_loss(corners, Size(100, 100)))
    # tl_y - bl_y = (0.8 - (-0.8))/2 * 100 = 80 pixels.
    np.testing.assert_allclose(loss, 80.0, atol=1e-4)


def test_out_of_image_loss_zero_inside():
    corners = theta_corners(make_theta(0.9, 0.9))
    assert float(out_of_image_loss(corners)) == 0.0


def test_out_of_image_loss_value():
    # x range [-1.5, 0.5]: tl_x = -1.5 -> 0.5 below -1. Other tracked
    # values (tl_y, tr_x, bl_y) stay inside.
    corners = theta_corners(make_theta(1.0, 0.5, tx=-0.5))
    np.testing.assert_allclose(
        float(out_of_image_loss(corners)), 0.5, atol=1e-5
    )


def test_out_of_image_loss_is_sum_over_batch():
    theta = np.concatenate(
        [make_theta(1.0, 0.5, tx=-0.5)] * 3, axis=0
    )
    np.testing.assert_allclose(
        float(out_of_image_loss(theta_corners(theta))), 1.5, atol=1e-5
    )


def test_min_max_area_losses():
    size = Size(100, 100)
    out = Size(25, 25)
    # Full image region: width = height = 100 -> min-area loss 0,
    # max-area loss 0.
    corners = theta_corners(make_theta(1.0, 1.0))
    assert float(min_area_loss(corners, size, out)) == 0.0
    assert float(max_area_loss(corners, size)) == 0.0
    # Tiny region 10x10: min-area loss = (25-10)*2 = 30.
    corners = theta_corners(make_theta(0.1, 0.1))
    np.testing.assert_allclose(
        float(min_area_loss(corners, size, out)), 30.0, atol=1e-3
    )
    # Oversized region 300x300: max-area loss = (300-100)*2 = 400.
    corners = theta_corners(make_theta(3.0, 3.0))
    np.testing.assert_allclose(
        float(max_area_loss(corners, size)), 400.0, atol=1e-3
    )


def test_aspect_ratio_loss():
    size = Size(100, 100)
    # Wide region (h/w = 0.25 < 0.5) -> no loss.
    corners = theta_corners(make_theta(0.8, 0.2))
    assert float(aspect_ratio_loss(corners, size)) == 0.0
    # Tall region h=80, w=20 -> aspect 80/20=4 -> loss 3.5.
    corners = theta_corners(make_theta(0.2, 0.8))
    np.testing.assert_allclose(
        float(aspect_ratio_loss(corners, size)), 3.5, atol=1e-4
    )


def test_rotation_dropout_ratio_zero_zeroes_offdiag():
    theta = np.array(
        [[[0.8, 0.3, 0.1], [-0.2, 0.7, -0.1]]], dtype=np.float32
    )
    for train in (True, False):
        out = np.asarray(rotation_dropout(jnp.asarray(theta), 0.0, train=train))
        np.testing.assert_allclose(out[0, 0, 1], 0.0)
        np.testing.assert_allclose(out[0, 1, 0], 0.0)
        np.testing.assert_allclose(out[0, 0, 0], 0.8)
        np.testing.assert_allclose(out[0, 1, 2], -0.1)


def test_rotation_dropout_eval_scales_offdiag():
    theta = np.array(
        [[[0.8, 0.4, 0.1], [-0.2, 0.7, -0.1]]], dtype=np.float32
    )
    out = np.asarray(rotation_dropout(jnp.asarray(theta), 0.5, train=False))
    np.testing.assert_allclose(out[0, 0, 1], 0.2, atol=1e-6)
    np.testing.assert_allclose(out[0, 1, 0], -0.1, atol=1e-6)


def test_transform_param_regression_loss_shapes():
    rng = np.random.default_rng(0)
    n, g = 6, 3
    theta = np.zeros((n, 2, 3), dtype=np.float32)
    theta[:, 0, 0] = rng.uniform(0.3, 1.0, n)
    theta[:, 1, 1] = rng.uniform(0.3, 1.0, n)
    corners = theta_corners(theta)
    gt = np.array(
        [[-0.5, -0.5, 0.5, 0.5], [-0.2, -0.2, 0.9, 0.9], [0, 0, 0, 0]],
        dtype=np.float32,
    )
    mask = np.array([True, True, False])
    scores = rng.normal(size=(n, 2)).astype(np.float32)
    reg, obj = transform_param_regression_loss(
        corners, jnp.asarray(gt), jnp.asarray(mask), jnp.asarray(scores)
    )
    assert np.isfinite(float(reg))
    assert np.isfinite(float(obj))
    assert float(obj) >= 0.0
