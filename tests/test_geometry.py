"""Geometry unit tests: theta-derived corners vs. materialized grids,
IoU against brute force."""

import numpy as np
import jax.numpy as jnp

from loans_tpu.ops import (
    Size,
    affine_grid,
    bbox_iou,
    corners_to_aabb,
    corners_to_bbox,
    elementwise_iou,
    grid_corners,
    theta_corners,
)


def random_theta(rng, n, rotated=True):
    theta = np.zeros((n, 2, 3), dtype=np.float32)
    theta[:, 0, 0] = rng.uniform(0.2, 1.2, n)
    theta[:, 1, 1] = rng.uniform(0.2, 1.2, n)
    theta[:, 0, 2] = rng.uniform(-0.5, 0.5, n)
    theta[:, 1, 2] = rng.uniform(-0.5, 0.5, n)
    if rotated:
        theta[:, 0, 1] = rng.uniform(-0.3, 0.3, n)
        theta[:, 1, 0] = rng.uniform(-0.3, 0.3, n)
    return theta


def test_theta_corners_match_grid_corners():
    rng = np.random.default_rng(0)
    theta = random_theta(rng, 5)
    grid = affine_grid(jnp.asarray(theta), Size(7, 9))
    np.testing.assert_allclose(
        np.asarray(theta_corners(theta)),
        np.asarray(grid_corners(grid)),
        atol=1e-5,
    )


def test_identity_theta_covers_image():
    theta = np.zeros((1, 2, 3), dtype=np.float32)
    theta[:, 0, 0] = 1.0
    theta[:, 1, 1] = 1.0
    aabb = corners_to_aabb(theta_corners(theta), Size(100, 200))
    np.testing.assert_allclose(
        np.asarray(aabb)[0], [0.0, 0.0, 100.0, 200.0], atol=1e-4
    )


def test_scaled_shifted_theta_bbox():
    # x in [-0.5+0.1, 0.5+0.1], y in [-0.25, 0.75] normalized.
    theta = np.array(
        [[[0.5, 0.0, 0.1], [0.0, 0.5, 0.25]]], dtype=np.float32
    )
    box = corners_to_bbox(theta_corners(theta), Size(100, 100))
    # (y1, x1, y2, x2) = ((0.75/2)*100, (0.6/2)*100, (1.75/2)*100, (1.6/2)*100)
    np.testing.assert_allclose(
        np.asarray(box)[0], [37.5, 30.0, 87.5, 80.0], atol=1e-4
    )


def brute_iou(a, b):
    y1 = max(a[0], b[0])
    x1 = max(a[1], b[1])
    y2 = min(a[2], b[2])
    x2 = min(a[3], b[3])
    inter = max(0.0, y2 - y1) * max(0.0, x2 - x1)
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def test_bbox_iou_matches_brute_force():
    rng = np.random.default_rng(1)
    n, k = 8, 6
    a = np.sort(rng.uniform(0, 100, (n, 2, 2)), axis=1).transpose(0, 2, 1)
    a = a.reshape(n, 4)[:, [0, 2, 1, 3]]  # (y1, x1, y2, x2)
    b = np.sort(rng.uniform(0, 100, (k, 2, 2)), axis=1).transpose(0, 2, 1)
    b = b.reshape(k, 4)[:, [0, 2, 1, 3]]
    got = np.asarray(bbox_iou(a.astype(np.float32), b.astype(np.float32)))
    want = np.array([[brute_iou(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_elementwise_iou_is_diagonal_of_matrix():
    rng = np.random.default_rng(2)
    n = 10
    a = np.sort(rng.uniform(0, 50, (n, 2, 2)), axis=1).transpose(0, 2, 1)
    a = a.reshape(n, 4)[:, [0, 2, 1, 3]].astype(np.float32)
    b = np.sort(rng.uniform(0, 50, (n, 2, 2)), axis=1).transpose(0, 2, 1)
    b = b.reshape(n, 4)[:, [0, 2, 1, 3]].astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(elementwise_iou(a, b)),
        np.diag(np.asarray(bbox_iou(a, b))),
        atol=1e-6,
    )


def test_aabb_encloses_rotated_region():
    rng = np.random.default_rng(3)
    theta = random_theta(rng, 4, rotated=True)
    size = Size(64, 64)
    grid = np.asarray(affine_grid(jnp.asarray(theta), Size(16, 16)))
    aabb = np.asarray(corners_to_aabb(theta_corners(theta), size))
    # Every grid corner pixel must lie inside the (clipped) aabb.
    px = np.clip((grid[..., 0] + 1) / 2 * size.width, 0, size.width)
    py = np.clip((grid[..., 1] + 1) / 2 * size.height, 0, size.height)
    for i in range(4):
        for yy, xx in [(0, 0), (0, -1), (-1, 0), (-1, -1)]:
            assert aabb[i, 0] - 1e-4 <= py[i, yy, xx] <= aabb[i, 2] + 1e-4
            assert aabb[i, 1] - 1e-4 <= px[i, yy, xx] <= aabb[i, 3] + 1e-4
