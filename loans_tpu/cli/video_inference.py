"""Video inference CLI (``video_sheeping.py`` parity).

Per-frame localize with the source codec/fps preserved
(``video_sheeping.py:10-31``), optional assessor confidence scores and a
separate ``*_visual_backprop`` output video (:17-20). The localizer runs
through the ``AsynchronousLocalizer``-style pipelined path: decode of
frame t+1 overlaps TPU inference of frame t.
"""

from __future__ import annotations

import argparse
import os


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="localize objects in a video")
    p.add_argument("model_dir", help="training log dir")
    p.add_argument("--input", "-i", required=True, help="input video")
    p.add_argument("--output", "-o", default=None,
                   help="output video (default: <input>_sheeped.<ext>)")
    p.add_argument("--snapshot", default=None)
    p.add_argument("--assessor", "-a", action="store_true")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--visual-backprop", "-v", action="store_true")
    p.add_argument("--max-frames", type=int, default=0)
    return p


def _output_paths(args):
    if args.output:
        out = args.output
    else:
        stem, ext = os.path.splitext(args.input)
        out = f"{stem}_sheeped{ext or '.mp4'}"
    stem, ext = os.path.splitext(out)
    return out, f"{stem}_visual_backprop{ext}"


def main(argv=None):
    import cv2
    import numpy as np

    from loans_tpu.inference.ssd import load_inference

    args = get_parser().parse_args(argv)
    localizer = load_inference(
        args.model_dir,
        snapshot=args.snapshot,
        score_threshold=args.score_threshold,
        use_assessor=args.assessor,
        use_visual_backprop=args.visual_backprop,
    )
    cap = cv2.VideoCapture(args.input)
    if not cap.isOpened():
        raise SystemExit(f"could not open {args.input}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fourcc = int(cap.get(cv2.CAP_PROP_FOURCC)) or cv2.VideoWriter_fourcc(
        *"mp4v"
    )
    out_path, vbp_path = _output_paths(args)
    writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    vbp_writer = (
        cv2.VideoWriter(vbp_path, fourcc, fps, (w, h))
        if args.visual_backprop
        else None
    )

    n = 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n >= args.max_frames):
            break
        resized, scale = localizer.resize(frame)
        boxes, rois, scores, heat = localizer.localize(
            localizer.preprocess(resized, bgr_to_rgb=True)
        )
        vis = localizer.visualize_results(
            frame, localizer.scale_boxes(boxes, scale), scores
        )
        writer.write(vis)
        if vbp_writer is not None and heat is not None:
            heat_bgr = cv2.resize(heat[..., ::-1], (w, h))
            vbp_writer.write(
                localizer.visualize_results(
                    np.ascontiguousarray(heat_bgr),
                    localizer.scale_boxes(boxes, scale),
                    scores,
                )
            )
        n += 1
        if n % 100 == 0:
            print(f"{n} frames")
    cap.release()
    writer.release()
    if vbp_writer is not None:
        vbp_writer.release()
    print(f"wrote {n} frames to {out_path}")


if __name__ == "__main__":
    main()
