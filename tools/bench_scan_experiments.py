"""Scan-step perf experiments on the real chip: batch scaling under the
pooled/scanned production path (+ optional XLA flags via env).

Usage: python tools/bench_scan_experiments.py [batch ...]
Set XLA_FLAGS in the environment to test compiler flags.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.data.device_data import device_chunk_batches
from loans_tpu.models import Localizer, ResnetAssessor
from loans_tpu.ops import Size
from loans_tpu.parallel import create_mesh, replicate
from loans_tpu.train import (
    AlternatingConfig,
    adam_amsgrad,
    alternating_step_body,
    create_train_state,
    make_pooled_train_step,
)

IMG, CROP = Size(224, 224), Size(75, 75)
K = 10


def measure(batch, calls=8, dtype=jnp.bfloat16):
    localizer = Localizer(
        out_size=CROP, n_layers=50, dtype=dtype, norm_dtype=dtype
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
    mesh = create_mesh()
    loc, ass = replicate(mesh, loc), replicate(mesh, ass)
    g = np.random.default_rng(0)
    groups = {
        "unlabeled": {
            "unlabeled": g.integers(0, 256, size=(512, 224, 224, 3),
                                    dtype=np.uint8)
        },
        "reference": {
            "real": g.integers(0, 256, size=(1024, 75, 75, 3),
                               dtype=np.uint8),
            "labels": g.uniform(size=(1024, 1)).astype(np.float32),
        },
    }
    chunks = device_chunk_batches(mesh, groups, batch, K, seed=0)
    step = make_pooled_train_step(
        alternating_step_body(
            localizer, assessor, AlternatingConfig(image_size=IMG)
        ),
        K,
    )
    key = jax.random.key(1)
    for _ in range(2):
        loc, ass, m = step(loc, ass, next(chunks), key)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(calls):
        loc, ass, m = step(loc, ass, next(chunks), key)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    ips = batch * K * calls / dt
    print(
        f"batch={batch:4d} K={K}: {ips:8.1f} img/s "
        f"({dt / (calls * K) * 1e3:6.2f} ms/it)",
        flush=True,
    )
    return ips


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    print("XLA_FLAGS:", _os.environ.get("XLA_FLAGS", ""), flush=True)
    batches = [int(a) for a in _sys.argv[1:]] or [64, 128, 256]
    for b in batches:
        measure(b)
