"""Live webcam demo CLI (``schaaaafrichter/live_sheeping.py`` parity).

Webcam loop: capture -> flip -> resize/preprocess -> async localize
(frames dropped while the worker is busy) -> draw boxes + FPS overlay;
hotkeys: ESC quit, +/- adjust score threshold, b toggle audio.
"""

from __future__ import annotations

import argparse


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="live webcam localization")
    p.add_argument("model_dir", help="training log dir")
    p.add_argument("--camera", "-c", type=int, default=0)
    p.add_argument("--snapshot", default=None)
    p.add_argument("--assessor", "-a", action="store_true")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--audio", default=None, help="wav to play on detection")
    return p


def main(argv=None):
    import cv2
    import numpy as np

    from loans_tpu.inference import AsynchronousLocalizer
    from loans_tpu.inference.camera import AudioRenderer, Camera
    from loans_tpu.inference.ssd import load_inference

    args = get_parser().parse_args(argv)
    localizer = load_inference(
        args.model_dir,
        snapshot=args.snapshot,
        score_threshold=args.score_threshold,
        use_assessor=args.assessor,
    )
    worker = AsynchronousLocalizer(localizer).start_localization_worker()
    audio = AudioRenderer(args.audio) if args.audio else None
    last = None
    try:
        with Camera(args.camera) as cam:
            while True:
                frame = cv2.flip(cam.get_frame(), 1)
                resized, scale = localizer.resize(frame)
                worker.submit(
                    localizer.preprocess(resized, bgr_to_rgb=True)
                )
                result = worker.get_result()
                if result is not None:
                    last = result
                if last is not None:
                    boxes, _, scores, _ = last
                    frame = localizer.visualize_results(
                        frame, localizer.scale_boxes(boxes, scale), scores
                    )
                    if audio and float(np.ravel(scores)[0]) > 0:
                        audio.play()
                cv2.putText(
                    frame, f"{worker.fps:.1f} fps", (10, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 0), 2,
                )
                cv2.imshow("loans-tpu live", frame)
                key = cv2.waitKey(1) & 0xFF
                if key == 27:
                    break
                elif key in (ord("+"), ord("=")):
                    localizer.score_threshold = min(
                        localizer.score_threshold + 0.05, 1.0
                    )
                elif key == ord("-"):
                    localizer.score_threshold = max(
                        localizer.score_threshold - 0.05, 0.0
                    )
                elif key == ord("b") and audio:
                    audio.toggle()
    finally:
        worker.shutdown()
        if audio:
            audio.shutdown()
        cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
