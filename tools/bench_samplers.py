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
METHODS = ("separable", "pallas", "general")


def timeit(name, fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
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

    print("devices:", jax.devices(), flush=True)
    for m in METHODS:
        fwd = jax.jit(
            lambda im, th, m=m: spatial_transform(im, th, CROP, method=m)
        )
        timeit(f"{m} forward", fwd, imgs, theta)

        def loss(im, th, m=m):
            return jnp.sum(
                jnp.square(spatial_transform(im, th, CROP, method=m))
            )

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        timeit(f"{m} forward+backward (d/dimg,d/dtheta)", grad, imgs, theta)


if __name__ == "__main__":
    main()
