"""Offline snapshot-sweep evaluation with resume.

Parity with the reference's ``evaluate.py``: sweep every
``<prefix>_<iter>`` snapshot in a log dir sorted by iteration
(:374), SKIP snapshots already present in ``eval_results.json``
(:362-372, ``--force-reset`` :357), isolate per-snapshot failures
(:375-381), compute VOC mAP + precision/recall/h-mean/bad-iou-mean
(:286-314), optionally render predictions with gt overlay
(``--save-predictions --render-gt`` :247-273) and export deteval XML
(:148-168), then plot the metric curves and report the best snapshot
(:320-339).

The model is rebuilt from the log dir's ``manifest.json`` via the
registry — replacing the reference's dynamic import of source files
copied into the log dir (:45-50).
"""

from __future__ import annotations

import json
import os
import traceback
from typing import Iterable

import jax
import numpy as np

from loans_tpu.evaluation.intraining import MAPEvaluator
from loans_tpu.train import checkpoint
from loans_tpu.utils.registry import build_model


class EvalResults:
    """Resumable ``eval_results.json`` (list of per-snapshot dicts)."""

    def __init__(self, path: str, force_reset: bool = False):
        self.path = path
        self.entries: list[dict] = []
        if not force_reset and os.path.exists(path):
            with open(path) as f:
                self.entries = json.load(f)

    def evaluated_snapshots(self) -> set[str]:
        return {e.get("snapshot_name", "") for e in self.entries}

    def append(self, entry: dict) -> None:
        self.entries.append(entry)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=2)
        os.replace(tmp, self.path)

    def best(self, key: str = "map") -> dict | None:
        scored = [e for e in self.entries if key in e]
        return max(scored, key=lambda e: e[key]) if scored else None


class Evaluator:
    """Snapshot sweep over a training log dir."""

    def __init__(
        self,
        log_dir: str,
        snapshot_prefix: str = "Localizer_",
        iou_threshold: float = 0.5,
        force_reset: bool = False,
        results_name: str = "eval_results.json",
        use_assessor: bool = False,
    ):
        self.log_dir = log_dir
        manifest = checkpoint.load_manifest(log_dir)
        self.manifest = manifest
        loc_cfg = manifest["localizer"]
        self.is_ssd = loc_cfg["model"].upper().startswith("SSD")
        self.ass_params = None
        self.localizer = build_model(loc_cfg["model"], **loc_cfg["kwargs"])
        if self.is_ssd:
            from loans_tpu.evaluation.ssd_eval import SSDEvaluator
            from loans_tpu.ops.geometry import Size

            s = self.localizer.input_size
            self.image_size = Size(s, s)
            self.map_eval = SSDEvaluator(
                self.localizer, self.localizer.coder()
            )
            default_prefix = manifest.get(
                "snapshot_names", [loc_cfg["model"]]
            )[0] + "_"
        else:
            self.image_size = self.localizer.input_size
            assessor = None
            self.ass_params = None
            if use_assessor and "assessor" in manifest:
                import jax.numpy as jnp

                a_cfg = manifest["assessor"]
                assessor = build_model(a_cfg["model"], **a_cfg["kwargs"])
                names = manifest.get("snapshot_names", [])
                prefix = (names[-1] if len(names) > 1 else "ResnetAssessor")
                snaps = checkpoint.list_snapshots(log_dir, prefix + "_")
                if snaps:
                    out_size = self.localizer.out_size
                    a_vars = assessor.init(
                        jax.random.key(0),
                        jnp.zeros(
                            (1, out_size.height, out_size.width, 3)
                        ),
                    )
                    self.ass_params, _ = checkpoint.restore_params(
                        snaps[-1][1], dict(a_vars["params"])
                    )
                    self.ass_params = jax.device_put(self.ass_params)
                else:
                    assessor = None
            self.map_eval = MAPEvaluator(
                self.localizer, self.image_size, iou_thresh=iou_threshold,
                assessor=assessor,
            )
            default_prefix = None
        self.snapshot_prefix = (
            default_prefix
            if self.is_ssd and snapshot_prefix == "Localizer_"
            else snapshot_prefix
        )
        self.results = EvalResults(
            os.path.join(log_dir, results_name), force_reset=force_reset
        )

    def _init_state(self):
        import jax.numpy as jnp

        from loans_tpu.train import adam_amsgrad, create_train_state

        return create_train_state(
            self.localizer,
            jax.random.key(0),
            jnp.zeros(
                (1, self.image_size.height, self.image_size.width, 3)
            ),
            adam_amsgrad(1e-3),
            train=False,
        )

    def _bn_warmup(self, snap_state, batches_factory, n_batches: int):
        """Refresh BatchNorm running statistics with ``n_batches``
        train-mode forwards before eval-mode scoring.

        Short runs snapshot models whose running stats lag the weights
        (chainer BN decay 0.9 equivalent); eval-mode predictions then
        read as near-zero IoU/mAP. This pass re-estimates the stats
        from data without touching the weights."""
        if self.is_ssd or n_batches <= 0:
            return snap_state

        if not hasattr(self, "_warmup_step"):
            from loans_tpu.train.steps import to_float01

            def warm(params, stats, images):
                _, updates = self.localizer.apply(
                    {"params": params, "batch_stats": stats},
                    to_float01(images),
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"rotation_dropout": jax.random.key(0)},
                )
                return updates["batch_stats"]

            self._warmup_step = jax.jit(warm, donate_argnums=(1,))

        stats = snap_state.batch_stats
        for i, batch in enumerate(batches_factory()):
            if i >= n_batches:
                break
            stats = self._warmup_step(snap_state.params, stats, batch[0])
        return snap_state.replace(batch_stats=stats)

    def sweep(
        self,
        batches_factory,
        save_predictions: str | None = None,
        deteval_dir: str | None = None,
        bn_warmup: int = 0,
    ):
        """Evaluate every un-scored snapshot.

        ``batches_factory()`` returns a fresh iterable of
        (images, gt_bboxes, ...) batches per snapshot. With
        ``deteval_dir``, a deteval XML of the predictions is written per
        snapshot (``evaluate.py:148-168``). ``bn_warmup`` re-estimates
        BatchNorm running stats from that many train-mode batches before
        scoring each snapshot.
        """
        state = self._init_state()
        done = self.results.evaluated_snapshots()
        snaps = checkpoint.list_snapshots(self.log_dir, self.snapshot_prefix)
        for iteration, path in snaps:
            name = os.path.basename(path)
            if name in done:
                continue
            try:
                params, stats = checkpoint.restore_params(
                    path, state.params, state.batch_stats
                )
                # upload once per snapshot (numpy leaves re-transfer on
                # every jitted call otherwise)
                params, stats = jax.device_put((params, stats))
                snap_state = state.replace(
                    params=params, batch_stats=stats
                )
                snap_state = self._bn_warmup(
                    snap_state, batches_factory, bn_warmup
                )
                metrics = (
                    self.map_eval(
                        snap_state,
                        batches_factory(),
                        ass_params=self.ass_params,
                    )
                    if not self.is_ssd
                    else self.map_eval(snap_state, batches_factory())
                )
                entry = {
                    "snapshot_name": name,
                    "iteration": iteration,
                    **{k: float(v) for k, v in metrics.items()},
                }
                self.results.append(entry)
                print(
                    f"{name}: map={entry.get('map', 0):.4f} "
                    f"mean_iou={entry.get('mean_iou', 0):.4f}"
                )
                if save_predictions and not self.is_ssd:
                    self._render_predictions(
                        snap_state, batches_factory(), iteration,
                        save_predictions,
                    )
                elif save_predictions:
                    self._render_ssd_predictions(
                        snap_state, batches_factory(), iteration,
                        save_predictions,
                    )
                if deteval_dir and not self.is_ssd:
                    self._write_deteval(
                        snap_state, batches_factory(), iteration,
                        deteval_dir,
                    )
            except Exception:
                print(f"evaluation of {name} failed:")
                traceback.print_exc()
        return self.results

    def _write_deteval(
        self, state, batches: Iterable, iteration: int, out_dir: str
    ):
        from loans_tpu.evaluation.deteval import DetEvalWriter

        writer = DetEvalWriter()
        idx = 0
        for batch in batches:
            theta = self.map_eval._eval_step(state, batch[0])
            boxes = np.asarray(
                jax.device_get(self.map_eval._boxes(theta))
            )
            for n in range(boxes.shape[0]):
                writer.add_image(f"{idx}.png", boxes[n : n + 1])
                idx += 1
        os.makedirs(out_dir, exist_ok=True)
        writer.write(os.path.join(out_dir, f"deteval_{iteration}.xml"))

    def _render_predictions(
        self, state, batches: Iterable, iteration: int, out_dir: str,
        render_gt: bool = True,
    ):
        from loans_tpu.insights.rendering import draw_boxes_on_image

        dest = os.path.join(out_dir, str(iteration))
        os.makedirs(dest, exist_ok=True)
        idx = 0
        for batch in batches:
            images, gt = batch[0], batch[1]
            theta = self.map_eval._eval_step(state, images)
            boxes = np.asarray(
                jax.device_get(self.map_eval._boxes(theta))
            )
            for n in range(boxes.shape[0]):
                gt_n = np.asarray(gt[n]).reshape(-1, 4)
                gt_n = gt_n[np.abs(gt_n).sum(axis=1) > 0]
                img = (np.asarray(images[n]) * 255).astype(np.uint8)
                canvas = draw_boxes_on_image(
                    img,
                    boxes[n : n + 1],
                    gt_boxes=gt_n if render_gt else None,
                )
                canvas.save(os.path.join(dest, f"{idx}.png"))
                idx += 1

    def _render_ssd_predictions(
        self, state, batches, iteration: int, out_dir: str
    ):
        from loans_tpu.insights.rendering import draw_boxes_on_image

        dest = os.path.join(out_dir, str(iteration))
        os.makedirs(dest, exist_ok=True)
        idx = 0
        for batch in batches:
            images, gt = batch[0], batch[1]
            for (boxes, _, scores), img, gt_n in zip(
                self.map_eval.detect(state, images),
                np.asarray(images),
                np.asarray(gt),
            ):
                gt_n = gt_n.reshape(-1, 4)
                gt_n = gt_n[np.abs(gt_n).sum(axis=1) > 0]
                canvas = draw_boxes_on_image(
                    (img * 255).astype(np.uint8), boxes,
                    gt_boxes=gt_n, scores=scores,
                )
                canvas.save(os.path.join(dest, f"{idx}.png"))
                idx += 1

    def plot(self, out_name: str = "plot.png", keys=("map", "mean_iou")):
        """Metric curves over iterations + best-snapshot report."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        entries = sorted(
            (e for e in self.results.entries if "iteration" in e),
            key=lambda e: e["iteration"],
        )
        if not entries:
            return None
        fig, ax = plt.subplots(figsize=(8, 5))
        its = [e["iteration"] for e in entries]
        for key in keys:
            ax.plot(its, [e.get(key, 0.0) for e in entries], label=key)
        ax.set_xlabel("iteration")
        ax.legend()
        path = os.path.join(self.log_dir, out_name)
        fig.savefig(path, dpi=120)
        plt.close(fig)
        best = self.results.best("map")
        if best:
            print(
                f"best snapshot: {best['snapshot_name']} "
                f"(map={best['map']:.4f})"
            )
        return path
