"""Profiling / tracing (SURVEY.md §5: absent in the reference; here a
first-class subsystem).

``ProfileHook`` captures a JAX profiler trace (XLA + host annotations,
viewable in TensorBoard / Perfetto) for a bounded window of training
iterations. ``StepTimer`` collects per-step wall latencies and
percentile summaries. The Trainer already reports ``images_per_sec``
per log interval; these add the deep-dive tools.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np


class ProfileHook:
    """Hook fn: trace iterations [start, start+steps).

    Usage: ``Hook(ProfileHook(log_dir, start=50, steps=5), every=1)``.
    """

    def __init__(self, log_dir: str, start: int = 50, steps: int = 5):
        self.trace_dir = os.path.join(log_dir, "profile")
        self.start = start
        self.steps = steps
        self._active = False
        self.done = False

    def __call__(self, trainer, iteration: int) -> None:
        if self.done:
            return
        if not self._active and iteration >= self.start:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            self._t0 = time.perf_counter()
        elif self._active and iteration >= self.start + self.steps:
            # block so the trace includes real device work
            jax.block_until_ready(trainer.loc_state.params)
            jax.profiler.stop_trace()
            self._active = False
            self.done = True
            dt = time.perf_counter() - self._t0
            print(
                f"profiler trace ({self.steps} steps, {dt:.2f}s) -> "
                f"{self.trace_dir}"
            )


class StepTimer:
    """Hook fn measuring per-step latency percentiles.

    Blocks on the state once per call, so use a coarse ``every`` or
    accept the sync cost. Summary printed/logged on ``report()``.
    """

    def __init__(self):
        self._last: float | None = None
        self.latencies: list[float] = []

    def __call__(self, trainer, iteration: int) -> None:
        jax.block_until_ready(trainer.loc_state.params)
        now = time.perf_counter()
        if self._last is not None:
            self.latencies.append(now - self._last)
        self._last = now

    def report(self) -> dict:
        if not self.latencies:
            return {}
        lat = np.asarray(self.latencies)
        return {
            "step_ms_p50": float(np.percentile(lat, 50) * 1e3),
            "step_ms_p90": float(np.percentile(lat, 90) * 1e3),
            "step_ms_p99": float(np.percentile(lat, 99) * 1e3),
            "step_ms_mean": float(lat.mean() * 1e3),
        }
