"""Capture a device profile of the bench train step and report top ops.

Runs the exact bench.py operating point (ResNet-50 localizer, 224x224,
75x75 crops, batch from argv, bf16 + bf16 BN), captures a perfetto
trace via jax.profiler, and prints the top-k device ops by total
duration — the profiling-driven tuning loop VERDICT.md item 2 asks for.

Usage: python tools/profile_step.py [batch] [outdir]
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
    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 64
    outdir = _sys.argv[2] if len(_sys.argv) > 2 else "/tmp/loans_profile"
    print("devices:", jax.devices(), flush=True)
    step, loc, ass, b, rng = build_step(batch)
    for _ in range(3):
        loc, ass, m = step(loc, ass, b, rng)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(10):
        loc, ass, m = step(loc, ass, b, rng)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / 10
    print(f"steady state: {dt * 1e3:.1f} ms/step, {batch / dt:.0f} img/s", flush=True)

    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        for _ in range(5):
            loc, ass, m = step(loc, ass, b, rng)
        jax.block_until_ready(m)
    parse_perfetto(outdir)


if __name__ == "__main__":
    main()
