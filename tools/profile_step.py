"""Capture a device profile of a train step and report top ops.

Default runs the exact bench.py operating point (ResNet-50 localizer,
224x224, 75x75 crops, batch from argv, bf16 + bf16 BN); ``--model
ssd300|ssd512`` profiles the SSD pooled step instead (on-device
augment + multibox encode, the production train_ssd path). Captures a
perfetto trace via jax.profiler and prints the top-k device ops by
total duration.

Usage: python tools/profile_step.py [batch] [outdir] [--model M] [--no-trace]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import gzip
import json
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np


def build_step(batch):
    from loans_tpu.models import Localizer, ResnetAssessor
    from loans_tpu.ops import Size
    from loans_tpu.train import (
        AlternatingConfig,
        adam_amsgrad,
        create_train_state,
        make_train_step,
    )

    img, crop = Size(224, 224), Size(75, 75)
    localizer = Localizer(
        out_size=crop, n_layers=50, dtype=jnp.bfloat16, norm_dtype=jnp.bfloat16
    )
    assessor = ResnetAssessor(dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    loc = create_train_state(
        localizer, rng, jnp.zeros((2, 224, 224, 3)), adam_amsgrad(1e-3),
        train=False,
    )
    ass = create_train_state(
        assessor, rng, jnp.zeros((2, 75, 75, 3)), adam_amsgrad(1e-3)
    )
    step = make_train_step(localizer, assessor, AlternatingConfig(image_size=img))
    g = np.random.default_rng(0)
    b = {
        "real": jnp.asarray(g.uniform(size=(batch, 75, 75, 3)).astype("f")),
        "labels": jnp.asarray(g.uniform(size=(batch, 1)).astype("f")),
        "unlabeled": jnp.asarray(
            g.uniform(size=(batch, 224, 224, 3)).astype("f")
        ),
    }
    return step, loc, ass, b, rng


def build_ssd_step(batch, variant="ssd300"):
    """SSD pooled step (one scanned iteration) over a raw scene pool —
    the production ``train_ssd --device-data`` path: augmentation +
    multibox encode run inside the jitted step."""
    from loans_tpu.data.ssd_device import ssd_pooled_body
    from loans_tpu.models import SSD300, SSD512
    from loans_tpu.train import create_train_state, make_pooled_train_step
    from loans_tpu.train.ssd_steps import ssd_optimizer

    model = (SSD300 if variant == "ssd300" else SSD512)(
        n_fg_class=1, dtype=jnp.bfloat16
    )
    size = model.input_size
    coder = model.coder()
    rng = jax.random.key(0)
    state = create_train_state(
        model, rng, jnp.zeros((2, size, size, 3)), ssd_optimizer(1e-4),
        train=False,
    )
    g = np.random.default_rng(0)
    n_pool = max(batch * 2, 64)
    pools = {
        "train": {
            "scenes": jnp.asarray(
                g.uniform(0, 255, (n_pool, size, size, 3)).astype(np.uint8)
            ),
            "boxes": jnp.asarray(
                np.tile(
                    np.array([40, 40, 200, 200], np.float32), (n_pool, 1, 1)
                )
            ),
            "valid": jnp.ones((n_pool, 1), bool),
        }
    }
    idx = {
        "train": jnp.asarray(
            g.integers(0, n_pool, (1, batch)).astype(np.int32)
        )
    }
    chunk = {"pools": pools, "idx": idx}
    pooled = make_pooled_train_step(ssd_pooled_body(model, coder, size), 1)
    return pooled, state, None, chunk, jax.random.key(1)


def parse_perfetto(outdir, top_k=40):
    """Sum device-track slice durations by op name from the perfetto trace."""
    paths = glob.glob(
        _os.path.join(outdir, "**", "perfetto_trace.json.gz"), recursive=True
    )
    if not paths:
        print("no perfetto trace found under", outdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # Identify device (TPU/XLA) threads: process names containing TPU/xla.
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e["pid"], "")
        tname = tid_name.get((e["pid"], e["tid"]), "")
        label = (pname + " " + tname).lower()
        if not ("tpu" in label or "xla op" in label or "device" in label):
            continue
        if "step" in tname.lower():
            continue
        d = e.get("dur", 0) / 1e3  # us -> ms
        dur_by_name[e["name"]] += d
        cnt_by_name[e["name"]] += 1
        total += d
    print(f"\n== device op totals (ms over the traced window; {total:.1f} ms) ==")
    for name, d in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"{d:10.3f} ms  x{cnt_by_name[name]:<5d} {100 * d / max(total, 1e-9):5.1f}%  {name[:110]}")
    # grouped by base op family (trailing .N stripped), full coverage
    import re

    fam_d = defaultdict(float)
    fam_c = defaultdict(int)
    for name, d in dur_by_name.items():
        fam = re.sub(r"\.\d+$", "", name)
        if fam.startswith("jit_"):
            fam = "jit_dispatch_span"
        fam_d[fam] += d
        fam_c[fam] += cnt_by_name[name]
    print("\n== grouped by op family (full trace coverage) ==")
    for fam, d in sorted(fam_d.items(), key=lambda kv: -kv[1]):
        print(
            f"{d:10.3f} ms  x{fam_c[fam]:<6d} "
            f"{100 * d / max(total, 1e-9):5.1f}%  {fam[:90]}"
        )


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("batch", nargs="?", type=int, default=64)
    p.add_argument("outdir", nargs="?", default="/tmp/loans_profile")
    p.add_argument("--model", default="localizer",
                   choices=["localizer", "ssd300", "ssd512"])
    p.add_argument("--no-trace", action="store_true",
                   help="steady-state timing only (for batch sweeps)")
    args = p.parse_args()
    batch, outdir = args.batch, args.outdir
    print("devices:", jax.devices(), flush=True)
    if args.model == "localizer":
        step, loc, ass, b, rng = build_step(batch)
    else:
        step, loc, ass, b, rng = build_ssd_step(batch, args.model)
    for _ in range(3):
        loc, ass, m = step(loc, ass, b, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(10):
        loc, ass, m = step(loc, ass, b, rng)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / 10
    print(f"steady state: {dt * 1e3:.1f} ms/step, {batch / dt:.0f} img/s", flush=True)
    if args.no_trace:
        return

    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        for _ in range(5):
            loc, ass, m = step(loc, ass, b, rng)
        jax.block_until_ready(m)
    parse_perfetto(outdir)


if __name__ == "__main__":
    main()
