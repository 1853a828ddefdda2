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
    p.add_argument("--batch-size", "-b", type=int, default=8,
                   help="frames per device dispatch; 1 = the reference's "
                        "frame-at-a-time loop (video_sheeping.py:34-75)")
    p.add_argument("--no-pipeline", action="store_true",
                   help="disable decode/compute overlap (for FPS A/B)")
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

    import time

    def read_batch():
        """Decode up to batch-size frames; returns ([], []) at EOF."""
        frames, inputs = [], []
        while len(frames) < max(args.batch_size, 1):
            if args.max_frames and n_read[0] + len(frames) >= args.max_frames:
                break
            ok, frame = cap.read()
            if not ok:
                break
            resized, _ = localizer.resize(frame)
            frames.append(frame)
            inputs.append(localizer.preprocess(resized, bgr_to_rgb=True))
        return frames, inputs

    def write_batch(frames, result):
        boxes, _rois, scores, heats = result
        for i, frame in enumerate(frames):
            scale = (frame.shape[0] / localizer.input_size.height,
                     frame.shape[1] / localizer.input_size.width)
            scaled = localizer.scale_boxes(boxes[i], scale)
            writer.write(
                localizer.visualize_results(frame, scaled, scores[i : i + 1])
            )
            if vbp_writer is not None and heats is not None:
                heat_bgr = cv2.resize(heats[i][..., ::-1], (w, h))
                vbp_writer.write(
                    localizer.visualize_results(
                        np.ascontiguousarray(heat_bgr),
                        scaled,
                        scores[i : i + 1],
                    )
                )

    n_read = [0]
    n = 0
    t0 = t_warm = None
    pending = None  # (frames, un-fetched device result) — double buffer
    while True:
        frames, inputs = read_batch()
        n_read[0] += len(frames)
        if t0 is None:
            t0 = time.time()
        if frames and len(inputs) < max(args.batch_size, 1):
            # pad the tail batch to the compiled shape; extra results are
            # dropped in write_batch (frames list stays authoritative)
            inputs = inputs + [inputs[-1]] * (
                max(args.batch_size, 1) - len(inputs)
            )
        handle = (
            localizer.localize_batch(inputs, sync=False) if frames else None
        )
        if args.no_pipeline and handle is not None:
            # force the serial decode -> compute -> write schedule
            import jax

            jax.block_until_ready(handle)
        if pending is not None:
            pf, ph = pending
            write_batch(pf, localizer.finish_batch(ph))
            n += len(pf)
            if t_warm is None:
                t_warm = time.time()  # first batch done = compile excluded
                n_warm = n
            if n % 96 < len(pf):
                print(f"{n} frames", flush=True)
        if handle is None:
            break
        pending = (frames, handle)
    cap.release()
    writer.release()
    if vbp_writer is not None:
        vbp_writer.release()
    if t_warm is not None and n > n_warm:
        fps_sustained = (n - n_warm) / (time.time() - t_warm)
        print(f"sustained fps (post-compile): {fps_sustained:.1f}")
    print(f"wrote {n} frames to {out_path}")


if __name__ == "__main__":
    main()
