"""Measure sustained video_sheeping FPS (single / gated / VBP, batched
and pipelined vs the reference's frame-at-a-time schedule).

BASELINE.md's north star includes ``video_sheeping.py`` FPS
(``video_sheeping.py:34-75`` decodes, localizes, and writes one frame at
a time — every frame pays the full host->device round-trip). The TPU
path batches frames per dispatch and double-buffers decode against
device compute (``loans_tpu/cli/video_inference.py``); this harness
quantifies each contribution on one synthetic video.

Usage:
  python tools/bench_video.py MODEL_LOG_DIR [--frames 240] [--out DIR]

Prints one table row per config: config name, sustained fps.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import contextlib
import io
import os
import re
import time


def make_test_video(path: str, frames: int, seed: int = 0,
                    size=(640, 480), assets: int = 256) -> str:
    import cv2
    import numpy as np

    from loans_tpu.data.synthetic import SyntheticLocalizerDataset

    ds = SyntheticLocalizerDataset(
        frames, image_size=size, seed=seed, output_dtype="uint8",
        asset_seed=seed + 9973, n_assets=assets,
    )
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 24, size
    )
    for i in range(frames):
        rgb = np.asarray(ds[i])
        writer.write(rgb[..., ::-1])
    writer.release()
    return path


def run_config(model_dir, video, out_dir, name, extra):
    from loans_tpu.cli import video_inference

    out = os.path.join(out_dir, f"{name}.mp4")
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        video_inference.main(
            [model_dir, "-i", video, "-o", out] + extra
        )
    text = buf.getvalue()
    m = re.search(r"sustained fps \(post-compile\): ([\d.]+)", text)
    fps = float(m.group(1)) if m else float("nan")
    print(f"{name:28s} sustained_fps={fps:8.1f}  wall={time.time() - t0:5.1f}s",
          flush=True)
    return name, fps


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_dir")
    p.add_argument("--frames", type=int, default=240)
    p.add_argument("--out", default="/tmp/bench_video")
    p.add_argument("--assets", type=int, default=256)
    p.add_argument("--seed", type=int, default=3)
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    video = os.path.join(args.out, "test_video.mp4")
    if not os.path.exists(video):
        print(f"generating {args.frames}-frame test video...", flush=True)
        make_test_video(video, args.frames, seed=args.seed,
                        assets=args.assets)

    configs = [
        # reference schedule: one frame per dispatch, serial
        ("b1_serial", ["-b", "1", "--no-pipeline"]),
        ("b1_pipelined", ["-b", "1"]),
        ("b8_pipelined", ["-b", "8"]),
        ("b32_pipelined", ["-b", "32"]),
        ("b8_gated", ["-b", "8", "-a"]),
        ("b8_vbp", ["-b", "8", "-a", "-v"]),
    ]
    results = [
        run_config(args.model_dir, video, args.out, name, extra)
        for name, extra in configs
    ]
    print("\n| config | sustained fps |\n|---|---|")
    for name, fps in results:
        print(f"| {name} | {fps:.1f} |")


if __name__ == "__main__":
    main()
