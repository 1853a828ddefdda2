"""Spatial transformer tests: separable/pallas vs. general gather path,
map_coordinates cross-check, and gradient checks (the VJP into theta is
where localizer learning happens — SURVEY.md §7 hard part (a))."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

from loans_tpu.ops import (
    Size,
    affine_grid,
    sample_grid,
    sample_separable,
    sample_separable_pallas,
)


def axis_aligned_theta(rng, n):
    theta = np.zeros((n, 2, 3), dtype=np.float32)
    theta[:, 0, 0] = rng.uniform(0.3, 1.1, n)
    theta[:, 1, 1] = rng.uniform(0.3, 1.1, n)
    theta[:, 0, 2] = rng.uniform(-0.4, 0.4, n)
    theta[:, 1, 2] = rng.uniform(-0.4, 0.4, n)
    return theta


def test_sample_grid_matches_map_coordinates_interior():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, 12, 17, 2)).astype(np.float32)
    theta = np.array(
        [[[0.4, 0.0, 0.05], [0.0, 0.5, -0.1]]], dtype=np.float32
    )
    grid = affine_grid(jnp.asarray(theta), Size(6, 5))
    got = np.asarray(sample_grid(jnp.asarray(img), grid))
    px = (np.asarray(grid)[0, ..., 0] + 1) / 2 * (17 - 1)
    py = (np.asarray(grid)[0, ..., 1] + 1) / 2 * (12 - 1)
    for ch in range(2):
        want = map_coordinates(
            jnp.asarray(img[0, :, :, ch]), [py, px], order=1
        )
        np.testing.assert_allclose(got[0, :, :, ch], want, atol=1e-5)


def test_separable_matches_general_axis_aligned():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(4, 24, 20, 3)).astype(np.float32)
    theta = axis_aligned_theta(rng, 4)
    out_size = Size(9, 11)
    general = sample_grid(
        jnp.asarray(img), affine_grid(jnp.asarray(theta), out_size)
    )
    separable = sample_separable(jnp.asarray(img), jnp.asarray(theta), out_size)
    np.testing.assert_allclose(
        np.asarray(general), np.asarray(separable), atol=1e-4
    )


def test_pallas_matches_separable():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
    theta = axis_aligned_theta(rng, 3)
    out_size = Size(8, 8)
    separable = sample_separable(jnp.asarray(img), jnp.asarray(theta), out_size)
    pallas = sample_separable_pallas(
        jnp.asarray(img), jnp.asarray(theta), out_size
    )
    np.testing.assert_allclose(
        np.asarray(separable), np.asarray(pallas), atol=1e-4
    )


def test_out_of_bounds_reads_zero():
    img = np.ones((1, 8, 8, 1), dtype=np.float32)
    # Shift the sampling window entirely off the image.
    theta = np.array(
        [[[0.5, 0.0, 5.0], [0.0, 0.5, 5.0]]], dtype=np.float32
    )
    for fn in (
        lambda: sample_grid(
            jnp.asarray(img), affine_grid(jnp.asarray(theta), Size(4, 4))
        ),
        lambda: sample_separable(
            jnp.asarray(img), jnp.asarray(theta), Size(4, 4)
        ),
    ):
        np.testing.assert_allclose(np.asarray(fn()), 0.0, atol=1e-6)


def test_identity_theta_resamples_image():
    rng = np.random.default_rng(3)
    img = rng.uniform(size=(2, 10, 10, 3)).astype(np.float32)
    theta = np.zeros((2, 2, 3), dtype=np.float32)
    theta[:, 0, 0] = 1.0
    theta[:, 1, 1] = 1.0
    out = sample_separable(jnp.asarray(img), jnp.asarray(theta), Size(10, 10))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


def test_gradients_separable_vs_general():
    """d(loss)/d(theta) must agree between the two formulations — this
    gradient drives the localizer (SURVEY.md §7)."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(size=(2, 14, 14, 2)).astype(np.float32))
    theta = jnp.asarray(axis_aligned_theta(rng, 2))
    out_size = Size(5, 7)
    mask = jnp.asarray(
        [[[1.0, 0.0, 1.0], [0.0, 1.0, 1.0]]], dtype=jnp.float32
    )

    def loss_general(th):
        crops = sample_grid(img, affine_grid(th * mask, out_size))
        return jnp.sum(jnp.sin(crops))

    def loss_separable(th):
        return jnp.sum(jnp.sin(sample_separable(img, th * mask, out_size)))

    g_general = np.asarray(jax.grad(loss_general)(theta))
    g_separable = np.asarray(jax.grad(loss_separable)(theta))
    np.testing.assert_allclose(g_general, g_separable, atol=1e-3)


def test_gradients_pallas_vjp():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(size=(2, 12, 12, 1)).astype(np.float32))
    theta = jnp.asarray(axis_aligned_theta(rng, 2))
    out_size = Size(6, 6)

    def loss_pallas(th, im):
        return jnp.sum(jnp.square(sample_separable_pallas(im, th, out_size)))

    def loss_ref(th, im):
        return jnp.sum(jnp.square(sample_separable(im, th, out_size)))

    gp_t, gp_i = jax.grad(loss_pallas, argnums=(0, 1))(theta, img)
    gr_t, gr_i = jax.grad(loss_ref, argnums=(0, 1))(theta, img)
    np.testing.assert_allclose(np.asarray(gp_t), np.asarray(gr_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp_i), np.asarray(gr_i), atol=1e-4)


def test_finite_difference_theta_grad():
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.uniform(size=(1, 16, 16, 1)).astype(np.float32))
    theta = jnp.asarray(axis_aligned_theta(rng, 1))
    out_size = Size(6, 6)

    def loss(th):
        return jnp.sum(sample_separable(img, th, out_size))

    g = np.asarray(jax.grad(loss)(theta))
    eps = 1e-3
    for (i, j) in [(0, 0), (0, 2), (1, 1), (1, 2)]:
        dt = np.zeros_like(np.asarray(theta))
        dt[0, i, j] = eps
        fd = (
            float(loss(theta + dt)) - float(loss(theta - dt))
        ) / (2 * eps)
        np.testing.assert_allclose(g[0, i, j], fd, rtol=5e-2, atol=5e-2)


def rotated_theta(rng, n):
    """Full-affine thetas with significant rotation/shear terms."""
    theta = axis_aligned_theta(rng, n)
    theta[:, 0, 1] = rng.uniform(-0.3, 0.3, n)
    theta[:, 1, 0] = rng.uniform(-0.3, 0.3, n)
    return theta


def test_rotated_dense_matches_general():
    from loans_tpu.ops import sample_rotated_dense

    rng = np.random.default_rng(7)
    img = rng.uniform(size=(4, 24, 20, 3)).astype(np.float32)
    theta = rotated_theta(rng, 4)
    out_size = Size(9, 11)
    general = sample_grid(
        jnp.asarray(img), affine_grid(jnp.asarray(theta), out_size)
    )
    dense = sample_rotated_dense(
        jnp.asarray(img), jnp.asarray(theta), out_size
    )
    np.testing.assert_allclose(
        np.asarray(general), np.asarray(dense), atol=1e-4
    )


def test_rotated_pallas_matches_general():
    from loans_tpu.ops import sample_rotated_pallas

    rng = np.random.default_rng(8)
    img = rng.uniform(size=(3, 16, 18, 3)).astype(np.float32)
    theta = rotated_theta(rng, 3)
    out_size = Size(8, 10)
    general = sample_grid(
        jnp.asarray(img), affine_grid(jnp.asarray(theta), out_size)
    )
    fused = sample_rotated_pallas(
        jnp.asarray(img), jnp.asarray(theta), out_size
    )
    np.testing.assert_allclose(
        np.asarray(general), np.asarray(fused), atol=1e-4
    )


def test_rotated_dense_out_of_bounds_reads_zero():
    from loans_tpu.ops import sample_rotated_dense

    img = jnp.ones((1, 10, 10, 1), dtype=jnp.float32)
    # Strong shift pushes most of the crop outside the image.
    theta = jnp.asarray(
        [[[1.0, 0.2, 1.8], [0.1, 1.0, 0.0]]], dtype=jnp.float32
    )
    out_size = Size(6, 6)
    general = sample_grid(img, affine_grid(theta, out_size))
    dense = sample_rotated_dense(img, theta, out_size)
    np.testing.assert_allclose(
        np.asarray(general), np.asarray(dense), atol=1e-5
    )
    assert float(np.asarray(dense).min()) == 0.0  # truly outside -> zero


def test_gradients_rotated_dense_vs_general():
    from loans_tpu.ops import sample_rotated_dense

    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.uniform(size=(2, 12, 14, 2)).astype(np.float32))
    theta = jnp.asarray(rotated_theta(rng, 2))
    out_size = Size(5, 7)

    def loss_general(im, th):
        out = sample_grid(im, affine_grid(th, out_size))
        return jnp.sum(out * out)

    def loss_dense(im, th):
        out = sample_rotated_dense(im, th, out_size)
        return jnp.sum(out * out)

    g_img, g_th = jax.grad(loss_general, argnums=(0, 1))(img, theta)
    d_img, d_th = jax.grad(loss_dense, argnums=(0, 1))(img, theta)
    np.testing.assert_allclose(
        np.asarray(g_img), np.asarray(d_img), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(g_th), np.asarray(d_th), atol=2e-3)


def test_gradients_rotated_pallas_vjp():
    from loans_tpu.ops import sample_rotated_dense, sample_rotated_pallas

    rng = np.random.default_rng(10)
    img = jnp.asarray(rng.uniform(size=(2, 12, 14, 2)).astype(np.float32))
    theta = jnp.asarray(rotated_theta(rng, 2))
    out_size = Size(5, 7)

    def loss(fn):
        return lambda im, th: jnp.sum(fn(im, th, out_size) ** 2)

    d = jax.grad(loss(sample_rotated_dense), argnums=(0, 1))(img, theta)
    p = jax.grad(loss(sample_rotated_pallas), argnums=(0, 1))(img, theta)
    for a, b in zip(d, p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_rotated_dense_axis_aligned_matches_separable():
    from loans_tpu.ops import sample_rotated_dense

    rng = np.random.default_rng(11)
    img = rng.uniform(size=(4, 24, 20, 3)).astype(np.float32)
    theta = axis_aligned_theta(rng, 4)
    out_size = Size(9, 11)
    separable = sample_separable(
        jnp.asarray(img), jnp.asarray(theta), out_size
    )
    dense = sample_rotated_dense(
        jnp.asarray(img), jnp.asarray(theta), out_size
    )
    np.testing.assert_allclose(
        np.asarray(separable), np.asarray(dense), atol=1e-4
    )
