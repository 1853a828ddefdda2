"""Offline dataset tooling CLIs.

Parity targets:
  * ``paste_and_crop`` — assessor-data compositor
    (``datasets/sheep/paste_and_crop_sheep.py:178-228``): paste RGBA
    stamps on backgrounds, IoU-stratified zoom crops, emit
    ``images/<i>.png`` + tab-separated ``images.csv`` with IoU labels.
  * ``extract_frames`` — video -> per-frame PNGs + ``gt.csv``
    (``video_analysis/extract_frames_from_video.py``).
  * ``blend_videos`` — alpha-blend two equal-length videos
    (``video_analysis/blend_videos.py``).
  * ``filter_single`` — keep only single-bbox gt entries
    (``datasets/sheep/extract_single_images.py``).
  * ``label_histogram`` — histogram of IoU labels
    (``datasets/sheep/csv_to_histogram.py``).
  * ``strip_params`` — delete param groups from a snapshot
    (``sheep/remove_weights_from_model.py``).

All are subcommands of one CLI: ``python -m loans_tpu.cli.dataset_tools
<cmd> ...``.
"""

from __future__ import annotations

import argparse
import csv
import json
import os


def cmd_paste_and_crop(args):
    from loans_tpu.data.synthetic import generate_dataset

    out = generate_dataset(
        args.destination,
        args.num_samples,
        stamps=args.stamps,
        background_dir=args.backgrounds,
        image_size=tuple(args.image_size),
        output_size=tuple(args.output_size),
        zoom_mode=not args.no_zoom,
        seed=args.seed,
    )
    print(f"wrote {out}")


def cmd_extract_frames(args):
    import cv2
    import numpy as np
    from PIL import Image

    os.makedirs(args.destination, exist_ok=True)
    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise SystemExit(f"could not open {args.video}")
    paths = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        img = Image.fromarray(np.asarray(frame)[..., ::-1])  # BGR -> RGB
        if args.resize:
            scale = args.resize / max(img.size)
            img = img.resize(
                (int(img.width * scale), int(img.height * scale)),
                Image.LANCZOS,
            )
        name = f"{i:06d}.png"
        img.save(os.path.join(args.destination, name))
        paths.append(name)
        i += 1
    cap.release()
    with open(os.path.join(args.destination, "gt.csv"), "w") as f:
        csv.writer(f, delimiter="\t").writerows([[p] for p in paths])
    print(f"extracted {i} frames to {args.destination}")


def cmd_blend_videos(args):
    import cv2

    cap1, cap2 = cv2.VideoCapture(args.video1), cv2.VideoCapture(args.video2)
    n1 = int(cap1.get(cv2.CAP_PROP_FRAME_COUNT))
    n2 = int(cap2.get(cv2.CAP_PROP_FRAME_COUNT))
    if n1 != n2:
        raise SystemExit(f"frame counts differ: {n1} vs {n2}")
    fps = cap1.get(cv2.CAP_PROP_FPS) or 24.0
    w = int(cap1.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap1.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(
        args.output, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    n = 0
    while True:
        ok1, f1 = cap1.read()
        ok2, f2 = cap2.read()
        if not (ok1 and ok2):
            break
        if f2.shape != f1.shape:
            f2 = cv2.resize(f2, (w, h))
        writer.write(
            cv2.addWeighted(f1, args.alpha, f2, 1.0 - args.alpha, 0)
        )
        n += 1
    for c in (cap1, cap2, writer):
        c.release()
    print(f"blended {n} frames -> {args.output}")


def cmd_filter_single(args):
    with open(args.gt) as f:
        data = json.load(f)
    kept = [d for d in data if len(d.get("bounding_boxes", [])) == 1]
    with open(args.output, "w") as f:
        json.dump(kept, f, indent=2)
    print(f"kept {len(kept)}/{len(data)} single-bbox entries")


def cmd_label_histogram(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = []
    with open(args.csv) as f:
        for row in csv.reader(f, delimiter="\t"):
            if len(row) > 1:
                labels.append(float(row[1]))
    fig, ax = plt.subplots()
    ax.hist(labels, bins=args.bins)
    ax.set_xlabel("IoU label")
    fig.savefig(args.output, dpi=120)
    print(f"{len(labels)} labels -> {args.output}")


def cmd_strip_params(args):
    from flax import serialization

    with open(args.snapshot, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def strip(tree, prefix, path=""):
        if not isinstance(tree, dict):
            return tree
        return {
            k: strip(v, prefix, f"{path}/{k}" if path else k)
            for k, v in tree.items()
            if not (f"{path}/{k}" if path else k).startswith(prefix)
        }

    for prefix in args.prefixes:
        raw["params"] = strip(raw.get("params", {}), prefix)
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(raw))
    print(f"wrote {args.output} (stripped {args.prefixes})")


def get_parser():
    p = argparse.ArgumentParser(description="loans_tpu dataset tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("paste_and_crop", help="synthesize assessor data")
    s.add_argument("destination")
    s.add_argument("num_samples", type=int)
    s.add_argument("--stamps", nargs="+", default=None)
    s.add_argument("--backgrounds", default=None)
    s.add_argument("--image-size", type=int, nargs=2, default=[224, 224])
    s.add_argument("--output-size", type=int, nargs=2, default=[75, 75])
    s.add_argument("--no-zoom", action="store_true")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_paste_and_crop)

    s = sub.add_parser("extract_frames", help="video -> frame PNGs + gt.csv")
    s.add_argument("video")
    s.add_argument("destination")
    s.add_argument("--resize", type=int, default=0,
                   help="longest-side resize")
    s.set_defaults(fn=cmd_extract_frames)

    s = sub.add_parser("blend_videos", help="alpha-blend two videos")
    s.add_argument("video1")
    s.add_argument("video2")
    s.add_argument("output")
    s.add_argument("--alpha", type=float, default=0.5)
    s.set_defaults(fn=cmd_blend_videos)

    s = sub.add_parser("filter_single", help="keep single-bbox gt entries")
    s.add_argument("gt")
    s.add_argument("output")
    s.set_defaults(fn=cmd_filter_single)

    s = sub.add_parser("label_histogram", help="IoU label histogram")
    s.add_argument("csv")
    s.add_argument("output")
    s.add_argument("--bins", type=int, default=17)
    s.set_defaults(fn=cmd_label_histogram)

    s = sub.add_parser("strip_params", help="delete param groups")
    s.add_argument("snapshot")
    s.add_argument("output")
    s.add_argument("--prefixes", nargs="+", default=["param_predictor"])
    s.set_defaults(fn=cmd_strip_params)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
