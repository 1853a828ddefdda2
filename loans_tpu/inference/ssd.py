"""Deployable SSD detector (schaaaafrichter inference parity).

Counterpart of ``schaaaafrichter/sheeping/sheep_localizer.py`` for the
supervised baseline: manifest-driven model rebuild, latest-snapshot
weight load, ``resize``/``preprocess``/``localize``/``visualize_results``
surface, adjustable ``score_thresh`` (:42-60). Batched decode on device,
native NMS on host.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.train import checkpoint
from loans_tpu.utils.registry import build_model


class SSDInference:
    def __init__(
        self,
        log_dir: str,
        snapshot: str | None = None,
        score_threshold: float = 0.6,
        nms_threshold: float = 0.45,
    ):
        from loans_tpu.evaluation.ssd_eval import SSDEvaluator

        self.log_dir = log_dir
        manifest = checkpoint.load_manifest(log_dir)
        self.manifest = manifest
        cfg = manifest["localizer"]
        self.model = build_model(cfg["model"], **cfg["kwargs"])
        self.input_size = self.model.input_size
        self.score_threshold = score_threshold
        coder = self.model.coder()
        self._evaluator = SSDEvaluator(
            self.model,
            coder,
            score_thresh=score_threshold,
            nms_thresh=nms_threshold,
        )
        self._state = self._load_weights(snapshot)

    def _load_weights(self, snapshot: str | None):
        from loans_tpu.train import create_train_state
        from loans_tpu.train.ssd_steps import ssd_optimizer

        state = create_train_state(
            self.model,
            jax.random.key(0),
            jnp.zeros((1, self.input_size, self.input_size, 3)),
            ssd_optimizer(1e-4),
            train=False,
        )
        if snapshot is None:
            prefix = self.manifest.get("snapshot_names", ["SSD300"])[0]
            snaps = checkpoint.list_snapshots(self.log_dir, prefix + "_")
            if not snaps:
                raise FileNotFoundError(
                    f"no {prefix}_*.msgpack snapshots in {self.log_dir}"
                )
            snapshot = snaps[-1][1]
        elif not os.path.isabs(snapshot):
            snapshot = os.path.join(self.log_dir, snapshot)
        params, stats = checkpoint.restore_params(
            snapshot, state.params, state.batch_stats
        )
        # upload once; numpy leaves would re-transfer on every call
        params, stats = jax.device_put((params, stats))
        return state.replace(params=params, batch_stats=stats)

    # -- public surface ----------------------------------------------------
    def resize(self, image: np.ndarray):
        import cv2

        h, w = image.shape[:2]
        resized = cv2.resize(
            image,
            (self.input_size, self.input_size),
            interpolation=cv2.INTER_CUBIC,
        )
        return resized, (h / self.input_size, w / self.input_size)

    def preprocess(self, image: np.ndarray, bgr_to_rgb: bool = False):
        arr = np.asarray(image)
        if bgr_to_rgb:
            arr = arr[..., ::-1]
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return arr

    def localize(self, image: np.ndarray):
        """Single image -> (boxes (K,4) pixels yxyx at model scale, rois
        placeholder None, scores (K,), heatmap None).

        Same 4-tuple shape as ``LocalizerInference.localize`` so the
        image/video CLIs work with either wrapper.
        """
        self._evaluator.score_thresh = self.score_threshold
        (boxes, labels, scores), = self._evaluator.detect(
            self._state, jnp.asarray(image[None])
        )
        return boxes, None, scores, None

    def scale_boxes(self, boxes: np.ndarray, scale) -> np.ndarray:
        sy, sx = scale
        return np.asarray(boxes, dtype=np.float64).reshape(-1, 4) * np.array(
            [sy, sx, sy, sx]
        )

    def visualize_results(self, image, bboxes, scores=None,
                          color=(0, 255, 0)):
        from loans_tpu.inference.localizer import LocalizerInference

        return LocalizerInference.visualize_results(
            self, image, bboxes, scores, color
        )


def load_inference(log_dir: str, **kwargs):
    """Build the right wrapper for a log dir (localizer vs SSD)."""
    manifest = checkpoint.load_manifest(log_dir)
    name = manifest["localizer"]["model"]
    if name.upper().startswith("SSD"):
        allowed = {"snapshot", "score_threshold"}
        return SSDInference(
            log_dir, **{k: v for k, v in kwargs.items() if k in allowed}
        )
    from loans_tpu.inference.localizer import LocalizerInference

    return LocalizerInference(log_dir, **kwargs)
