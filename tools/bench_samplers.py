"""Isolated sampler comparison on the real chip (VERDICT r1 item 8).

Times forward and forward+backward of each spatial_transform method on
the bench operating point (batch 64, 224x224 -> 75x75), standalone and
embedded in the full localizer loss, so the comparison in RESULTS.md is
measured rather than "within noise" hand-waving.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.ops import Size
from loans_tpu.ops.stn import spatial_transform

BATCH = 64
IMG, CROP = Size(224, 224), Size(75, 75)
METHODS = ("separable", "pallas", "rotated", "rotated_pallas", "general")


def timeit(name, fn, *args, iters=50):
    """Device time per call: ``iters`` applications run inside ONE
    jitted scan (async dispatch makes per-call host timing measure only
    enqueue cost for sub-ms ops)."""

    def many(im, th):
        def step(acc, _):
            # the carry perturbs theta so LICM cannot hoist the body
            out = fn(im, th + acc * 1e-20)
            return acc + out * 1e-20, None

        acc, _ = jax.lax.scan(step, 0.0, None, length=iters)
        return acc

    jmany = jax.jit(many)
    out = jmany(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jmany(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    g = np.random.default_rng(0)
    imgs = jnp.asarray(
        g.uniform(size=(BATCH, IMG.height, IMG.width, 3)).astype("f")
    )
    theta = jnp.asarray(
        np.tile(
            np.array([[0.7, 0.0, 0.1], [0.0, 0.6, -0.1]], dtype="f"),
            (BATCH, 1, 1),
        )
    )
    rot = jnp.asarray(
        np.tile(
            np.array([[0.7, 0.15, 0.1], [-0.12, 0.6, -0.1]], dtype="f"),
            (BATCH, 1, 1),
        )
    )

    print("devices:", jax.devices(), flush=True)
    for m in METHODS:
        th = theta if m in ("separable", "pallas") else rot
        fwd = lambda im, t, m=m: jnp.sum(
            spatial_transform(im, t, CROP, method=m)
        )
        timeit(f"{m} forward", fwd, imgs, th, iters=100)

        def loss(im, t, m=m):
            return jnp.sum(
                jnp.square(spatial_transform(im, t, CROP, method=m))
            )

        def gsum(im, t, m=m):
            gi, gt = jax.grad(loss, argnums=(0, 1))(im, t)
            return jnp.sum(gi) + jnp.sum(gt)

        timeit(f"{m} forward+backward (d/dimg,d/dtheta)", gsum, imgs, th,
               iters=100)


if __name__ == "__main__":
    main()
