"""GIF / video compilation of the per-iteration bbox renders.

Parity with ``train_utils/create_gif.py`` (``make_gif``: PIL delta-frame
GIF of the ``bboxes/<iter>.png`` stream) and ``create_video.py``
(``make_video``: mpeg via external tooling — imageio/ffmpeg here).
"""

from __future__ import annotations

import os
import re

from PIL import Image

_NUM_RE = re.compile(r"(\d+)")


def _numeric_key(name: str):
    m = _NUM_RE.search(os.path.basename(name))
    return int(m.group(1)) if m else -1


def list_frames(frame_dir: str) -> list[str]:
    """All PNG frames sorted by embedded iteration number."""
    files = [
        os.path.join(frame_dir, f)
        for f in os.listdir(frame_dir)
        if f.endswith(".png")
    ]
    return sorted(files, key=_numeric_key)


def make_gif(
    frame_dir: str,
    dest: str,
    fps: int = 10,
    max_frames: int | None = None,
    resize_to: tuple[int, int] | None = None,
) -> str:
    frames = list_frames(frame_dir)
    if max_frames and len(frames) > max_frames:
        stride = len(frames) / max_frames
        frames = [frames[int(i * stride)] for i in range(max_frames)]
    if not frames:
        raise ValueError(f"no frames in {frame_dir}")
    images = []
    for path in frames:
        img = Image.open(path).convert("RGB")
        if resize_to:
            img = img.resize(resize_to, Image.BILINEAR)
        images.append(img)
    images[0].save(
        dest,
        save_all=True,
        append_images=images[1:],
        duration=int(1000 / fps),
        loop=0,
        optimize=True,
    )
    return dest


def make_video(frame_dir: str, dest: str, fps: int = 24) -> str:
    import cv2
    import numpy as np

    frames = list_frames(frame_dir)
    if not frames:
        raise ValueError(f"no frames in {frame_dir}")
    first = Image.open(frames[0])
    # even dimensions for codec compatibility
    size = (first.width // 2 * 2, first.height // 2 * 2)
    writer = cv2.VideoWriter(
        dest, cv2.VideoWriter_fourcc(*"mp4v"), fps, size
    )
    try:
        for path in frames:
            img = Image.open(path).convert("RGB").resize(size)
            writer.write(np.asarray(img)[..., ::-1])  # RGB -> BGR
    finally:
        writer.release()
    return dest
