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
        low_iou_fraction=args.low_iou,
        base_bboxes=args.base_bboxes,
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


def cmd_average_snapshots(args):
    """Average the weights of several training snapshots (SWA).

    Post-takeoff snapshots of the weakly-supervised run bounce around a
    ±0.05 mAP band (RESULTS.md round-3: Run D 0.83–0.90 across
    14k–20k), so single-best-snapshot selection rides eval noise.
    Averaging the last-K snapshots' params (Izmailov et al., SWA) is a
    zero-training-cost variance killer; BatchNorm statistics must be
    re-estimated afterwards, which the evaluator's ``--bn-warmup``
    already does. The averaged snapshot is written back into the log
    dir under the next iteration number so the resumable eval sweep
    (``evaluate.py``) picks it up incrementally. The reference has no
    equivalent (its snapshot tools are convert/strip only) — this is a
    beyond-parity addition.
    """
    import numpy as np
    from flax import serialization

    from loans_tpu.train import checkpoint

    snaps = checkpoint.list_snapshots(args.log_dir, args.prefix)
    snaps = [
        (it, p)
        for it, p in snaps
        if it >= args.min_iteration
        and (args.max_iteration is None or it <= args.max_iteration)
    ]
    if len(snaps) < 2:
        raise SystemExit(
            f"need >=2 snapshots with prefix {args.prefix!r} in "
            f"[{args.min_iteration}, {args.max_iteration}], "
            f"found {len(snaps)}"
        )

    def tree_add(acc, tree):
        if isinstance(tree, dict):
            return {k: tree_add(acc[k] if acc else None, v)
                    for k, v in tree.items()}
        v = np.asarray(tree, dtype=np.float64)
        return v if acc is None else acc + v

    def tree_div(acc, tree, n):
        if isinstance(tree, dict):
            return {k: tree_div(acc[k], tree[k], n) for k, v in tree.items()}
        return (acc / n).astype(np.asarray(tree).dtype)

    acc_p = acc_s = None
    raw = None
    for it, path in snaps:
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        acc_p = tree_add(acc_p, raw.get("params", {}))
        acc_s = tree_add(acc_s, raw.get("batch_stats", {}))
    n = len(snaps)
    # keep the LAST snapshot's step/opt_state so shape-strict
    # restore_state() still works on the averaged file
    raw["params"] = tree_div(acc_p, raw.get("params", {}), n)
    raw["batch_stats"] = tree_div(acc_s, raw.get("batch_stats", {}), n)

    # default OUTSIDE the numbered-snapshot namespace: an SWA file named
    # <prefix><last+1> would become the dir's implicit "latest" snapshot
    # and silently win any latest-snapshot selection (inference, resume)
    # even though best-snapshot beats SWA in every measured run
    if args.output:
        out = args.output
    elif args.out_iteration is not None:
        out = os.path.join(
            args.log_dir, f"{args.prefix}{args.out_iteration}.msgpack"
        )
    else:
        out = os.path.join(args.log_dir, f"{args.prefix}swa.msgpack")
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(raw))
    os.replace(tmp, out)
    print(
        f"wrote SWA of {n} snapshots "
        f"({snaps[0][0]}..{snaps[-1][0]}) -> {out}"
    )


def cmd_plot_log(args):
    """Plot train/eval metric curves from a training log
    (``train_utils/plotting.py`` ``LogPlotter``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from loans_tpu.train.logger import MetricsLog

    entries = MetricsLog.read(args.log)
    entries = [e for e in entries if "iteration" in e]
    if not entries:
        raise SystemExit("no metric entries in log")
    keys = args.keys or [
        k
        for k in entries[-1]
        if k not in ("iteration", "elapsed_time", "lr")
        and isinstance(entries[-1][k], (int, float))
    ]
    n = len(keys)
    fig, axes = plt.subplots(
        (n + 1) // 2, 2, figsize=(11, 3 * ((n + 1) // 2)), squeeze=False
    )
    its = [e["iteration"] for e in entries]
    for ax, key in zip(axes.flat, keys):
        ax.plot(its, [e.get(key, float("nan")) for e in entries])
        ax.set_title(key)
        ax.set_xlabel("iteration")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"plotted {keys} -> {args.output}")


def cmd_convert_snapshot(args):
    """Full-trainer snapshot -> model-only params snapshot
    (``schaaaafrichter/convert_model.py`` parity: strips optimizer
    state)."""
    from flax import serialization

    with open(args.snapshot, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    payload = {
        "params": raw.get("params", {}),
        "batch_stats": raw.get("batch_stats", {}),
    }
    with open(args.output, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    print(f"wrote model-only snapshot {args.output}")


def cmd_generate_scenes(args):
    """Paste stamps into annotated background bboxes, emit
    ``train_info.json``/``test_info.json``
    (``schaaaafrichter/generation/generate.py`` parity, fixed seed)."""
    import random

    import numpy as np
    from PIL import Image

    with open(args.annotations) as f:
        backgrounds = json.load(f)
    stamps = [Image.open(s).convert("RGBA") for s in args.stamps]
    rng = random.Random(args.seed)
    os.makedirs(os.path.join(args.destination, "images"), exist_ok=True)
    records = []
    idx = 0
    for bg_entry in backgrounds:
        bg = Image.open(bg_entry["image"]).convert("RGB")
        for _ in range(args.per_background):
            canvas = bg.copy()
            boxes = []
            for y1, x1, y2, x2 in bg_entry.get("bounding_boxes", []):
                stamp = rng.choice(stamps)
                w, h = int(x2 - x1), int(y2 - y1)
                if w <= 0 or h <= 0:
                    continue
                resized = stamp.resize((w, h), Image.LANCZOS)
                canvas.paste(resized, (int(x1), int(y1)), resized)
                boxes.append([float(y1), float(x1), float(y2), float(x2)])
            name = f"images/{idx}.png"
            canvas.save(os.path.join(args.destination, name))
            records.append({"image": name, "bounding_boxes": boxes})
            idx += 1
    rng.shuffle(records)
    split = int(len(records) * (1 - args.test_fraction))
    for fname, recs in (
        ("train_info.json", records[:split]),
        ("test_info.json", records[split:]),
    ):
        with open(os.path.join(args.destination, fname), "w") as f:
            json.dump(recs, f, indent=2)
    print(
        f"generated {len(records)} scenes "
        f"({split} train / {len(records) - split} test)"
    )


def get_parser():
    p = argparse.ArgumentParser(description="loans_tpu dataset tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("paste_and_crop", help="synthesize assessor data")
    s.add_argument("--low-iou", type=float, default=0.0,
                   help="fraction of unconstrained random crops (mostly "
                   "IoU~0; object-free assessor coverage - see RESULTS.md)")
    s.add_argument("destination")
    s.add_argument("num_samples", type=int)
    s.add_argument("--stamps", nargs="+", default=None)
    s.add_argument("--backgrounds", default=None)
    s.add_argument("--image-size", type=int, nargs=2, default=[224, 224])
    s.add_argument("--output-size", type=int, nargs=2, default=[75, 75])
    s.add_argument("--no-zoom", action="store_true")
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--base-bboxes", default=None, metavar="JSON",
                   help="bbox-annotation json; stamps are resized to the "
                   "real gt box-size distribution "
                   "(paste_and_crop_sheep.py:111,157-175)")
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

    s = sub.add_parser("average_snapshots",
                       help="SWA-average snapshot weights in a log dir")
    s.add_argument("log_dir")
    s.add_argument("--prefix", default="Localizer_")
    s.add_argument("--min-iteration", type=int, default=0)
    s.add_argument("--max-iteration", type=int, default=None)
    s.add_argument("--out-iteration", type=int, default=None,
                   help="write the output under this iteration number in "
                   "the numbered-snapshot namespace (default: "
                   "<prefix>swa.msgpack, OUTSIDE the namespace so the SWA "
                   "file never becomes the implicit latest snapshot)")
    s.add_argument("--output", default=None,
                   help="explicit output path (overrides naming scheme)")
    s.set_defaults(fn=cmd_average_snapshots)

    s = sub.add_parser("plot_log", help="plot metric curves from a log")
    s.add_argument("log", help="log file or training log dir")
    s.add_argument("output")
    s.add_argument("--keys", nargs="+", default=None)
    s.set_defaults(fn=cmd_plot_log)

    s = sub.add_parser("convert_snapshot",
                       help="strip optimizer state from a snapshot")
    s.add_argument("snapshot")
    s.add_argument("output")
    s.set_defaults(fn=cmd_convert_snapshot)

    s = sub.add_parser("generate_scenes",
                       help="paste stamps into annotated background bboxes")
    s.add_argument("annotations", help="json [{'image','bounding_boxes'}]")
    s.add_argument("destination")
    s.add_argument("--stamps", nargs="+", required=True)
    s.add_argument("--per-background", type=int, default=1)
    s.add_argument("--test-fraction", type=float, default=0.2)
    s.add_argument("--seed", type=int, default=42)
    s.set_defaults(fn=cmd_generate_scenes)
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
