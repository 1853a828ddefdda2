"""Runtime training control: interactive REPL + control-file channel.

Parity with ``commands/interactive_train.py`` (daemon stdin REPL with
``shiftlr <f>``, ``enablebboxvis``, ``quit``, ``echo``) — plus a
control-FILE channel suited to non-interactive TPU jobs: append commands
to ``<log_dir>/control`` and the trainer consumes them at the next
iteration boundary. LR changes go through
``TrainState.with_learning_rate`` (optax ``inject_hyperparams``), so
they take effect WITHOUT recompiling the jitted step — the TPU-native
version of mutating ``optimizer.alpha`` on a live chainer optimizer.
"""

from __future__ import annotations

import os
import sys
import threading
from queue import Empty, Queue


class CommandChannel:
    """Merged command stream from stdin REPL and a control file."""

    def __init__(self, log_dir: str | None = None, use_stdin: bool = False):
        self._queue: Queue[str] = Queue()
        self._control_path = (
            os.path.join(log_dir, "control") if log_dir else None
        )
        self._consumed = 0
        if use_stdin and sys.stdin is not None:
            t = threading.Thread(target=self._stdin_loop, daemon=True)
            t.start()

    def _stdin_loop(self):
        try:
            for line in sys.stdin:
                self._queue.put(line.strip())
        except Exception:
            pass

    def _poll_file(self):
        if not self._control_path or not os.path.exists(self._control_path):
            return
        try:
            with open(self._control_path) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
        except OSError:
            return
        for line in lines[self._consumed :]:
            self._queue.put(line)
        self._consumed = len(lines)

    def drain(self) -> list[str]:
        self._poll_file()
        out = []
        while True:
            try:
                out.append(self._queue.get_nowait())
            except Empty:
                return out


def apply_commands(commands: list[str], trainer) -> None:
    """Execute control commands against a running Trainer."""
    for cmd in commands:
        parts = cmd.split()
        if not parts:
            continue
        op, args = parts[0].lower(), parts[1:]
        if op == "shiftlr" and args:
            factor = float(args[0])
            trainer.shift_learning_rate(factor)
        elif op == "setlr" and args:
            trainer.set_learning_rate(float(args[0]))
        elif op == "quit":
            trainer.request_stop()
        elif op == "enablebboxvis":
            trainer.enable_bbox_vis()
        elif op == "echo":
            print(" ".join(args))
        else:
            print(f"unknown control command: {cmd!r}")
