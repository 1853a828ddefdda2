"""Standalone live progress viewer (``train_utils/show_progress.py``
parity): TCP server receiving base64-PNG JSON frames from the
BBoxPlotter; tkinter window when a display exists, ``--save-dir``
headless mode otherwise."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from loans_tpu.insights import ImageServer

    p = argparse.ArgumentParser(description="live training image viewer")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", "-p", type=int, default=1337)
    p.add_argument("--save-dir", default=None,
                   help="also save every received frame here")
    p.add_argument("--headless", action="store_true",
                   help="no window; requires --save-dir")
    args = p.parse_args(argv)

    show = not args.headless and bool(os.environ.get("DISPLAY"))
    server = ImageServer(
        args.host, args.port, save_dir=args.save_dir, show_window=show
    )
    print(f"listening on {args.host}:{args.port}")
    server.start()
    if not show:  # serve_forever runs in a daemon thread; block here
        import time

        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            server.stop()


if __name__ == "__main__":
    main()
