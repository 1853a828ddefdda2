"""Live training-image streaming: TCP client + receiving server/viewer.

Wire format is the reference's (``insights/bbox_plotter.py:89-115`` send
side, ``train_utils/show_progress.py:44-66`` receive side): one JSON
object per connection — ``{"width", "height", "channels", "title",
"image": <base64 PNG>}``. The sender self-disables on connection refusal
and can be re-enabled by the ``enablebboxvis`` control command
(``bbox_plotter.py:101-105``, ``interactive_train.py:16-19``).

The server here is headless-first (saves received frames / invokes a
callback); the tkinter window of ``show_progress.py`` is available via
``ImageServer(show_window=True)`` when a display exists.
"""

from __future__ import annotations

import base64
import io
import json
import socket
import socketserver
import threading
from typing import Callable

from PIL import Image

DEFAULT_PORT = 1337


class ImageClient:
    """Fire-and-forget PNG sender (one connection per frame)."""

    def __init__(self, host: str = "127.0.0.1", port: int = DEFAULT_PORT):
        self.host = host
        self.port = port
        self.enabled = True

    def enable_send(self):
        self.enabled = True

    def send(self, image: Image.Image, title: str = "") -> bool:
        if not self.enabled:
            return False
        buf = io.BytesIO()
        image.save(buf, format="PNG")
        payload = json.dumps(
            {
                "width": image.width,
                "height": image.height,
                "channels": len(image.getbands()),
                "title": title,
                "image": base64.b64encode(buf.getvalue()).decode("ascii"),
            }
        ).encode("utf-8")
        try:
            with socket.create_connection(
                (self.host, self.port), timeout=1.0
            ) as s:
                s.sendall(payload)
            return True
        except OSError:
            # self-disable until explicitly re-enabled (reference behavior)
            self.enabled = False
            return False


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        chunks = []
        while True:
            data = self.request.recv(65536)
            if not data:
                break
            chunks.append(data)
        try:
            msg = json.loads(b"".join(chunks).decode("utf-8"))
            img = Image.open(
                io.BytesIO(base64.b64decode(msg["image"]))
            ).convert("RGB")
        except Exception:
            return
        self.server.owner._on_image(img, msg.get("title", ""))


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


class ImageServer:
    """Threaded receiver; callback per frame, optional tkinter display."""

    def __init__(
        self,
        host: str = "0.0.0.0",
        port: int = DEFAULT_PORT,
        on_image: Callable[[Image.Image, str], None] | None = None,
        save_dir: str | None = None,
        show_window: bool = False,
    ):
        self.on_image = on_image
        self.save_dir = save_dir
        self.show_window = show_window
        self.latest: Image.Image | None = None
        self.count = 0
        self._server = _Server((host, port), _Handler)
        self._server.owner = self
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._window = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self):
        self._thread.start()
        if self.show_window:
            self._run_window()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()

    def _on_image(self, img: Image.Image, title: str):
        self.latest = img
        self.count += 1
        if self.save_dir:
            import os

            os.makedirs(self.save_dir, exist_ok=True)
            img.save(f"{self.save_dir}/{self.count:06d}.png")
        if self.on_image is not None:
            self.on_image(img, title)
        if self._window is not None:
            self._window.update(img, title)

    def _run_window(self):
        """Blocking tkinter viewer (``show_progress.py`` parity)."""
        import tkinter as tk

        from PIL import ImageTk

        root = tk.Tk()
        root.title("training progress")
        label = tk.Label(root)
        label.pack()

        class _Win:
            def __init__(self):
                self.pending = None

            def update(self, img, title):
                self.pending = (img, title)

        self._window = _Win()

        def tick():
            if self._window.pending is not None:
                img, title = self._window.pending
                self._window.pending = None
                photo = ImageTk.PhotoImage(img)
                label.configure(image=photo)
                label.image = photo
                if title:
                    root.title(title)
            root.after(100, tick)

        tick()
        root.mainloop()
