"""Deployable localizer: resize / preprocess / localize / visualize.

Parity with the reference inference wrapper stack
(``schaaaafrichter/sheeping/sheep_localizer.py`` ``SheepLocalizer``:
config from the log's first entry :14-18, lazy ``build_model`` + weight
load + ``score_thresh`` :42-60, ``resize`` :62-70, ``preprocess``
:72-78, ``localize`` :80-85, ``visualize_results`` cv2 boxes with
size-adaptive thickness :87-121) and its unsupervised subclass
(``sheep/unsupervised_sheep_localizer.py``: assessor score gating
:40-48 — results zeroed below ``score_threshold`` — and VisualBackprop
heatmap output :50-54).

The model is rebuilt from ``manifest.json`` via the registry instead of
importing source files copied into the log dir, and the forward is one
jitted program (backbone + STN + optional assessor + optional VBP) with
a fixed input size — no per-frame retrace.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.insights.rendering import heatmap_to_rgb
from loans_tpu.insights.visual_backprop import flatten_vbp, visual_backprop
from loans_tpu.ops.geometry import corners_to_aabb, theta_corners
from loans_tpu.train import checkpoint
from loans_tpu.utils.registry import build_model


class LocalizerInference:
    def __init__(
        self,
        log_dir: str,
        snapshot: str | None = None,
        score_threshold: float = 0.3,
        use_assessor: bool = False,
        use_visual_backprop: bool = False,
    ):
        self.log_dir = log_dir
        manifest = checkpoint.load_manifest(log_dir)
        self.manifest = manifest
        loc_cfg = manifest["localizer"]
        self.localizer = build_model(loc_cfg["model"], **loc_cfg["kwargs"])
        self.input_size = self.localizer.input_size
        self.score_threshold = score_threshold
        self.use_assessor = use_assessor and "assessor" in manifest
        self.use_visual_backprop = use_visual_backprop
        self.assessor = (
            build_model(
                manifest["assessor"]["model"],
                **manifest["assessor"]["kwargs"],
            )
            if self.use_assessor
            else None
        )
        self._variables = self._load_weights(snapshot)
        self._predict = jax.jit(self._predict_impl)

    # -- weights ----------------------------------------------------------
    def _load_weights(self, snapshot: str | None) -> dict[str, Any]:
        dummy = jnp.zeros(
            (1, self.input_size.height, self.input_size.width, 3)
        )
        variables = self.localizer.init(
            jax.random.key(0), dummy, train=False
        )
        loc_params, loc_stats = dict(variables["params"]), dict(
            variables.get("batch_stats", {})
        )
        if snapshot is None:
            prefix = self.manifest.get("snapshot_names", ["Localizer"])[0]
            snaps = checkpoint.list_snapshots(self.log_dir, prefix + "_")
            if not snaps:
                raise FileNotFoundError(
                    f"no {prefix}_*.msgpack snapshots in {self.log_dir}"
                )
            snapshot = snaps[-1][1]
        elif not os.path.isabs(snapshot):
            snapshot = os.path.join(self.log_dir, snapshot)
        loc_params, loc_stats = checkpoint.restore_params(
            snapshot, loc_params, loc_stats
        )
        out = {"loc": {"params": loc_params, "batch_stats": loc_stats}}
        if self.assessor is not None:
            a_vars = self.assessor.init(
                jax.random.key(0),
                jnp.zeros(
                    (
                        1,
                        self.localizer.out_size.height,
                        self.localizer.out_size.width,
                        3,
                    )
                ),
            )
            names = self.manifest.get(
                "snapshot_names", ["Localizer", "ResnetAssessor"]
            )
            a_snaps = checkpoint.list_snapshots(
                self.log_dir, names[-1] + "_"
            )
            a_params = dict(a_vars["params"])
            if a_snaps:
                a_params, _ = checkpoint.restore_params(
                    a_snaps[-1][1], a_params
                )
            out["ass"] = {"params": a_params}
        # restored leaves are host numpy; upload ONCE — otherwise every
        # jitted call re-transfers the full weight set
        return jax.device_put(out)

    # -- jitted forward ---------------------------------------------------
    def _predict_impl(self, variables, images):
        mutable = (
            ["vbp", "vbp_anchor"] if self.use_visual_backprop else False
        )
        if mutable:
            (rois, theta), state = self.localizer.apply(
                variables["loc"], images, train=False, mutable=mutable
            )
        else:
            rois, theta = self.localizer.apply(
                variables["loc"], images, train=False
            )
            state = None
        boxes = corners_to_aabb(
            theta_corners(theta), self.input_size, clip=True
        )
        scores = (
            self.assessor.apply(variables["ass"], rois)[:, 0]
            if self.assessor is not None
            else jnp.ones((images.shape[0],), jnp.float32)
        )
        heat = None
        if state is not None:
            heat = visual_backprop(
                state["vbp_anchor"]["anchor"][0],
                flatten_vbp(state["vbp"]),
                self.localizer.vbp_ladder(),
            )
        return rois, boxes, scores, heat

    # -- public API (reference surface) -----------------------------------
    def resize(self, image: np.ndarray):
        """Resize HWC uint8/float to the model input; returns (resized,
        (scale_y, scale_x)) for mapping boxes back."""
        import cv2

        h, w = image.shape[:2]
        resized = cv2.resize(
            image,
            (self.input_size.width, self.input_size.height),
            interpolation=cv2.INTER_CUBIC,
        )
        return resized, (h / self.input_size.height, w / self.input_size.width)

    def preprocess(
        self, image: np.ndarray, bgr_to_rgb: bool = False
    ) -> np.ndarray:
        """HWC -> float32 [0,1] RGB (cv2 frames pass bgr_to_rgb=True)."""
        arr = np.asarray(image)
        if bgr_to_rgb:
            arr = arr[..., ::-1]
        arr = arr.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return arr

    def localize(self, image: np.ndarray):
        """Single-image inference.

        Returns (bboxes (K,4) yxyx pixels at model scale, rois, scores,
        heatmap-or-None). Below ``score_threshold`` with the assessor
        enabled, boxes/scores are zeroed (reference gating,
        ``unsupervised_sheep_localizer.py:45-48``).
        """
        batch = jnp.asarray(image[None])
        rois, boxes, scores, heat = jax.device_get(
            self._predict(self._variables, batch)
        )
        boxes, rois, scores = boxes[:1], rois[:1], scores[:1]
        if self.use_assessor and float(scores[0]) < self.score_threshold:
            boxes = np.zeros_like(boxes)
            scores = np.zeros_like(scores)
        heat_img = (
            heatmap_to_rgb(heat[0]) if heat is not None else None
        )
        return boxes, rois, scores, heat_img

    def localize_batch(self, images, sync: bool = True):
        """Batched inference over a list/stack of preprocessed frames.

        One jitted dispatch for the whole batch — through the device
        tunnel this amortizes the per-call round-trip that makes
        ``localize``'s frame-at-a-time loop latency-bound
        (``video_sheeping.py:34-75`` runs frame-at-a-time; batching is
        the TPU-native re-expression). With ``sync=False`` the
        un-fetched device output is returned immediately (jax dispatch
        is asynchronous), so the caller can decode the next batch while
        this one computes; pass it to ``finish_batch`` to collect.
        """
        batch = jnp.asarray(
            np.stack(images) if isinstance(images, (list, tuple)) else images
        )
        out = self._predict(self._variables, batch)
        return out if not sync else self.finish_batch(out)

    def finish_batch(self, out):
        """Block on a ``localize_batch(sync=False)`` result; returns
        (boxes (B,1,4), rois, scores (B,), heat_imgs list-or-None) with
        the reference's assessor gating applied per frame."""
        rois, boxes, scores, heat = jax.device_get(out)
        if self.use_assessor:
            gated = scores < self.score_threshold
            boxes = np.where(gated[:, None], 0.0, boxes)
            scores = np.where(gated, 0.0, scores)
        heat_imgs = (
            [heatmap_to_rgb(h) for h in heat] if heat is not None else None
        )
        return boxes[:, None, :], rois, scores, heat_imgs

    def scale_boxes(self, boxes: np.ndarray, scale) -> np.ndarray:
        sy, sx = scale
        return np.asarray(boxes, dtype=np.float64) * np.array(
            [sy, sx, sy, sx]
        )

    def visualize_results(
        self, image: np.ndarray, bboxes, scores=None, color=(0, 255, 0)
    ) -> np.ndarray:
        """Draw boxes/scores on a (possibly BGR) frame with
        size-adaptive line thickness (reference :87-121)."""
        import cv2

        out = np.ascontiguousarray(np.asarray(image))
        thickness = max(1, min(out.shape[:2]) // 200)
        font_scale = max(0.4, min(out.shape[:2]) / 600)
        h, w = out.shape[:2]
        for i, (y1, x1, y2, x2) in enumerate(
            np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        ):
            if not np.isfinite([y1, x1, y2, x2]).all():
                continue
            x1, x2 = np.clip([x1, x2], -w, 2 * w)
            y1, y2 = np.clip([y1, y2], -h, 2 * h)
            if x2 - x1 <= 0 or y2 - y1 <= 0:
                continue
            cv2.rectangle(
                out,
                (int(x1), int(y1)),
                (int(x2), int(y2)),
                color,
                thickness,
            )
            if scores is not None and i < len(np.ravel(scores)):
                cv2.putText(
                    out,
                    f"{float(np.ravel(scores)[i]):.2f}",
                    (int(x1), max(int(y1) - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX,
                    font_scale,
                    color,
                    thickness,
                )
        return out
