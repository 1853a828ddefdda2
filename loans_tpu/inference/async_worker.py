"""Asynchronous inference worker for live feeds.

Parity with ``schaaaafrichter/sheeping/asynchronous_sheep_localizer.py``:
the model runs in a background worker with 1-deep input/output queues —
frames are DROPPED when the worker is busy (backpressure,
``live_sheeping.py:46-48``), the worker measures FPS (:30-34), and
shutdown drains the queues cleanly via an Event (:47-51).

TPU note: the reference forks a separate *process* (model rebuilt in the
child). A thread is the right boundary here — the jitted forward
releases the GIL while the TPU executes, and a fork would need its own
TPU client. The public surface (``start_localization_worker``,
``localization_queue``/``image_queue``, ``shutdown``) is preserved.
"""

from __future__ import annotations

import queue
import threading
import time


class AsynchronousLocalizer:
    def __init__(self, localizer):
        """``localizer`` is a ``LocalizerInference`` (or anything with a
        ``localize(image)`` method)."""
        self.localizer = localizer
        self.localization_queue: queue.Queue = queue.Queue(maxsize=1)
        self.image_queue: queue.Queue = queue.Queue(maxsize=1)
        self.fps = 0.0
        self._stop = threading.Event()
        self._worker: threading.Thread | None = None

    def start_localization_worker(self):
        self._stop.clear()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()
        return self

    def submit(self, image) -> bool:
        """Non-blocking frame submit; False when the worker is busy."""
        try:
            self.localization_queue.put_nowait(image)
            return True
        except queue.Full:
            return False

    def get_result(self):
        """Non-blocking result fetch; None when nothing is ready."""
        try:
            return self.image_queue.get_nowait()
        except queue.Empty:
            return None

    def _loop(self):
        while not self._stop.is_set():
            try:
                image = self.localization_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            t0 = time.perf_counter()
            result = self.localizer.localize(image)
            dt = time.perf_counter() - t0
            self.fps = 1.0 / dt if dt > 0 else 0.0
            try:
                self.image_queue.put_nowait(result)
            except queue.Full:
                try:  # replace the stale result
                    self.image_queue.get_nowait()
                    self.image_queue.put_nowait(result)
                except queue.Empty:
                    pass

    def shutdown(self):
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=2.0)
        for q in (self.localization_queue, self.image_queue):
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
