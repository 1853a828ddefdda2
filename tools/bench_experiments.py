"""Perf experiments on the real chip: batch scaling + sampler variants.

Not the driver benchmark (see bench.py); a scratch harness for tuning.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.models import Localizer, ResnetAssessor
from loans_tpu.ops import Size
from loans_tpu.train import (
    AlternatingConfig,
    adam_amsgrad,
    create_train_state,
    make_train_step,
)

IMG, CROP = Size(224, 224), Size(75, 75)


def measure(batch, sampler="auto", iters=10, dtype=jnp.bfloat16,
            norm_dtype=jnp.float32):
    localizer = Localizer(
        out_size=CROP, n_layers=50, dtype=dtype, sampler=sampler,
        norm_dtype=norm_dtype,
    )
    assessor = ResnetAssessor(dtype=dtype)
    rng = jax.random.key(0)
    loc = create_train_state(
        localizer, rng, jnp.zeros((2, 224, 224, 3)), adam_amsgrad(1e-3),
        train=False,
    )
    ass = create_train_state(
        assessor, rng, jnp.zeros((2, 75, 75, 3)), adam_amsgrad(1e-3)
    )
    step = make_train_step(localizer, assessor, AlternatingConfig())
    g = np.random.default_rng(0)
    b = {
        "real": jnp.asarray(
            g.uniform(size=(batch, 75, 75, 3)).astype("f")
        ),
        "labels": jnp.asarray(g.uniform(size=(batch, 1)).astype("f")),
        "unlabeled": jnp.asarray(
            g.uniform(size=(batch, 224, 224, 3)).astype("f")
        ),
    }
    for _ in range(3):
        loc, ass, m = step(loc, ass, b, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        loc, ass, m = step(loc, ass, b, rng)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    print(
        f"batch={batch:4d} sampler={sampler:10s} dtype={dtype.__name__} "
        f"norm={norm_dtype.__name__}: "
        f"{batch * iters / dt:8.1f} img/s  ({dt / iters * 1e3:6.1f} ms/step)",
        flush=True,
    )


if __name__ == "__main__":
    import sys

    print("devices:", jax.devices(), flush=True)
    if "bn" in sys.argv:
        measure(64, norm_dtype=jnp.bfloat16)
        measure(128, norm_dtype=jnp.bfloat16)
        measure(64)  # f32 BN baseline
    else:
        for batch in (64, 128, 256):
            measure(batch)
        measure(64, sampler="pallas")
        measure(64, sampler="general")
        measure(64, dtype=jnp.float32)
