"""Isolated sampler comparison on the real chip (VERDICT r1 item 8).

Times forward and forward+backward of each spatial_transform method on
the bench operating point (batch 64, 224x224 -> 75x75), standalone and
(with --step) embedded in the full alternating train step, so the
comparison in RESULTS.md is measured rather than "within noise"
hand-waving.

Harness notes (round-4 rewrite): the round-3 version timed one jitted
scan bounded by ``jax.block_until_ready`` — which on the tunneled axon
backend returns before remote execution finishes, so every sampler
"measured" ~1 us (docs/results/logs_r3/35_bench_samplers.sh.out). This
version (a) uses a HOST READBACK (``float(...)``) as the timing
boundary, which cannot complete before the device work does, (b)
calibrates the harness against a matmul of known FLOPs and refuses to
print sampler numbers if the implied TFLOP/s exceeds the chip's peak,
and (c) checks linearity in the scan length (t(4k) ~ 4*t(k)); a
harness that fails either check prints HARNESS INVALID instead of
garbage.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.ops import Size
from loans_tpu.ops.stn import spatial_transform

BATCH = 64
IMG, CROP = Size(224, 224), Size(75, 75)
METHODS = ("separable", "pallas", "rotated", "rotated_pallas", "general")
# bf16 peak of a v5e chip; f32 sampler math runs far below it, so any
# "measurement" implying more than peak is a broken harness, full stop
PEAK_TFLOPS = 197.0


def _scan_timer(fn, args, iters):
    """Seconds per application of ``fn``, measured as one jitted scan of
    ``iters`` data-dependent applications, bounded by host readback."""

    def many(im, th):
        def step(acc, _):
            # the carry perturbs theta so the body cannot be hoisted
            out = fn(im, th + acc * 1e-20)
            return acc + out * 1e-20, None

        acc, _ = jax.lax.scan(step, 0.0, None, length=iters)
        return acc

    jmany = jax.jit(many)
    float(jmany(*args))  # compile + first execution settle
    t0 = time.perf_counter()
    float(jmany(*args))  # readback: cannot return before device work
    return (time.perf_counter() - t0) / iters


def timeit(name, fn, *args, iters=100):
    dt = _scan_timer(fn, args, iters)
    # linearity self-check: a quarter-length scan must take ~1/4 the
    # wall (within generous tunnel-noise bounds), else the body was
    # optimized away or the boundary leaked
    dt_q = _scan_timer(fn, args, max(iters // 4, 1))
    total, total_q = dt * iters, dt_q * max(iters // 4, 1)
    if total > 4e-3 and not (1.5 <= total / total_q <= 12.0):
        print(
            f"{name:48s} HARNESS INVALID "
            f"(t({iters})={total * 1e3:.3f} ms vs "
            f"t({iters // 4})={total_q * 1e3:.3f} ms not ~4x)",
            flush=True,
        )
        return None
    print(f"{name:48s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def calibrate():
    """Refuse to run if the timer implies super-peak throughput."""
    n = 2048
    g = np.random.default_rng(0)
    a = jnp.asarray(g.uniform(size=(n, n)).astype(jnp.bfloat16))
    b = jnp.asarray(g.uniform(size=(n, n)).astype(jnp.bfloat16))

    dt = _scan_timer(
        lambda x, y: jnp.sum((x @ y).astype(jnp.float32)), (a, b), 50
    )
    tflops = 2 * n**3 / dt / 1e12
    print(
        f"calibration: {n}x{n} bf16 matmul {dt * 1e6:.1f} us "
        f"= {tflops:.1f} TFLOP/s (peak {PEAK_TFLOPS:.0f})",
        flush=True,
    )
    if tflops > PEAK_TFLOPS * 1.2:
        raise SystemExit(
            "HARNESS INVALID: timer implies super-peak matmul throughput; "
            "the timing boundary is not observing device completion"
        )
    if tflops < 1.0:
        print(
            "note: calibration far below peak (CPU backend or tiny "
            "dispatch-bound op) — absolute numbers are still trustworthy, "
            "just not MXU-saturated",
            flush=True,
        )


def bench_standalone():
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


def bench_step(batch, rotation_ratio):
    """Full alternating train step per sampler method — the end-to-end
    number that decides which sampler the production config uses
    (reference op: ``F.spatial_transformer_sampler``,
    ``sheep/sheep_localizer.py:63``)."""
    from loans_tpu.models import Localizer, ResnetAssessor
    from loans_tpu.train import (
        AlternatingConfig,
        adam_amsgrad,
        alternating_step_body,
        create_train_state,
        make_pooled_train_step,
    )
    from loans_tpu.data.device_data import device_chunk_batches
    from loans_tpu.parallel import create_mesh, replicate

    steps_per_call = 10
    mesh = create_mesh()
    g = np.random.default_rng(0)
    groups = {
        "unlabeled": {
            "unlabeled": g.integers(
                0, 256, size=(256, IMG.height, IMG.width, 3), dtype=np.uint8
            )
        },
        "reference": {
            "real": g.integers(
                0, 256, size=(512, CROP.height, CROP.width, 3),
                dtype=np.uint8,
            ),
            "labels": g.uniform(size=(512, 1)).astype(np.float32),
        },
    }
    for m in METHODS:
        localizer = Localizer(
            out_size=CROP, n_layers=50, dtype=jnp.bfloat16,
            norm_dtype=jnp.bfloat16, sampler=m,
            rotation_dropout_ratio=rotation_ratio,
        )
        assessor = ResnetAssessor(dtype=jnp.bfloat16)
        rng = jax.random.key(0)
        loc_state = create_train_state(
            localizer, rng, jnp.zeros((2, IMG.height, IMG.width, 3)),
            adam_amsgrad(1e-3), train=False,
        )
        ass_state = create_train_state(
            assessor, rng, jnp.zeros((2, CROP.height, CROP.width, 3)),
            adam_amsgrad(1e-3),
        )
        loc_state = replicate(mesh, loc_state)
        ass_state = replicate(mesh, ass_state)
        chunks = device_chunk_batches(mesh, groups, batch, steps_per_call,
                                      seed=0)
        step = make_pooled_train_step(
            alternating_step_body(
                localizer, assessor, AlternatingConfig(image_size=IMG)
            ),
            steps_per_call,
        )
        key = jax.random.key(1)
        for _ in range(2):  # compile + settle
            loc_state, ass_state, metrics = step(
                loc_state, ass_state, next(chunks), key
            )
        float(metrics["loss_localizer"])
        calls = 5
        t0 = time.perf_counter()
        for _ in range(calls):
            loc_state, ass_state, metrics = step(
                loc_state, ass_state, next(chunks), key
            )
        float(metrics["loss_localizer"])  # host readback boundary
        dt = time.perf_counter() - t0
        ips = batch * steps_per_call * calls / dt
        print(
            f"step[{m}] rotation_ratio={rotation_ratio} batch={batch}: "
            f"{dt / calls / steps_per_call * 1e3:.2f} ms/iter, "
            f"{ips:.0f} img/s",
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", action="store_true",
                    help="also time the full alternating step per sampler")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--rotation-ratio", type=float, default=0.5)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    calibrate()
    bench_standalone()
    if args.step:
        bench_step(args.batch, args.rotation_ratio)


if __name__ == "__main__":
    main()
