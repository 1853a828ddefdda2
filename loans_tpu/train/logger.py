"""JSON metrics log, reference-compatible.

The reference's ``Logger(LogReport)`` writes the log file as a JSON list
of per-interval dicts, with the full train config folded into the FIRST
entry (``train_utils/logger.py``, ``backup_train_config`` postprocess at
``train_sheep_localizer.py:166-180``); downstream tools treat
``log[0]`` as the config source of truth (``evaluate.py:38-42``,
``schaaaafrichter/sheeping/sheep_localizer.py:14-18``). Same contract
here, plus an optional tensorboardX writer (``logger.py:34-36``).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsLog:
    """Append-only JSON-list log with config-enriched first entry."""

    def __init__(
        self,
        log_dir: str,
        config: dict[str, Any] | None = None,
        log_name: str = "log",
        tensorboard: bool = False,
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, log_name)
        self.entries: list[dict[str, Any]] = []
        self._config = dict(config or {})
        self._start = time.time()
        self._writer = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(
                    os.path.join(log_dir, "tensorboard")
                )
            except Exception:
                self._writer = None

    def append(self, metrics: dict[str, Any]) -> None:
        entry = {
            k: (float(v) if _is_scalar(v) else v) for k, v in metrics.items()
        }
        entry.setdefault("elapsed_time", time.time() - self._start)
        if not self.entries and self._config:
            entry.update(self._config)
        self.entries.append(entry)
        self.flush()
        if self._writer is not None and "iteration" in entry:
            it = int(entry["iteration"])
            for k, v in entry.items():
                if _is_scalar(v):
                    self._writer.add_scalar(k, float(v), it)

    def flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=2, default=str)
        os.replace(tmp, self.path)

    @staticmethod
    def read(log_dir_or_path: str) -> list[dict[str, Any]]:
        path = log_dir_or_path
        if os.path.isdir(path):
            path = os.path.join(path, "log")
        with open(path) as f:
            return json.load(f)

    @staticmethod
    def read_config(log_dir_or_path: str) -> dict[str, Any]:
        """Config = first log entry (reference contract)."""
        entries = MetricsLog.read(log_dir_or_path)
        return entries[0] if entries else {}


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
