"""Supervised SSD training CLI (``schaaaafrichter/train.py`` parity).

SSD300/512 with ``n_fg_class=1``, the 5-step augmentation, multibox
loss, Adam + bias-gradient-scaling + weight decay, periodic VOC mAP
eval, config-enriched JSON log, full-state snapshots/resume. Data
parallelism is the sharded-batch SPMD program (the reference's
``MultiprocessParallelUpdater``).
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax
import jax.numpy as jnp
import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="train a supervised SSD")
    p.add_argument("train_file", help="gt json "
                   "({'image','bounding_boxes'} records) or 'synthetic[:N]'")
    p.add_argument("val_file", help="gt json or 'synthetic[:N]'")
    p.add_argument("--model", choices=["ssd300", "ssd512"],
                   default="ssd300")
    p.add_argument("--batch-size", "-b", type=int, default=8)
    p.add_argument("--learning-rate", "-lr", type=float, default=1e-4)
    p.add_argument("--iterations", "-it", type=int, default=1000)
    p.add_argument("--log-dir", "-l", default="logs")
    p.add_argument("--log-name", "-ln", default="ssd_training")
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--snapshot-interval", "-si", type=int, default=5000)
    p.add_argument("--eval-interval", type=int, default=1000)
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--resume", default=None)
    p.add_argument("--pretrained-model", default=None,
                   help="backbone weights (tools/import_vgg16.py output); "
                   "heads keep their fresh init")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--plot-interval", type=int, default=0,
                   help="render detections on a fixed val image every N "
                   "iterations (schaaaafrichter BBOXPlotter: 10)")
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--device-data", choices=["auto", "on", "off"],
                   default="auto",
                   help="HBM-resident scene pool + on-device augment/encode "
                   "scanned step (data/ssd_device.py) - the host 5-step "
                   "Transform caps throughput at ~10-30 img/s. auto = on "
                   "for synthetic data")
    p.add_argument("--steps-per-call", type=int, default=0,
                   help="train iterations per jitted dispatch on the "
                   "device-data path (0 = 8)")
    p.add_argument("--synthetic-assets", type=int, default=0, metavar="N",
                   help="share one procedural asset world (asset seed = "
                   "seed + 9973) between synthetic train and val, like "
                   "train_localizer")
    p.add_argument("--seed", type=int, default=0)
    return p


class SSDPlotHook:
    """Draw current detections on one fixed image
    (``schaaaafrichter/insights/bbox_plotter.py`` parity)."""

    def __init__(self, evaluator, image, gt, log_dir):
        import os

        self.evaluator = evaluator
        self.image = np.asarray(image, dtype=np.float32)
        self.gt = np.asarray(gt, dtype=np.float32).reshape(-1, 4)
        self.out_dir = os.path.join(log_dir, "bboxes")
        os.makedirs(self.out_dir, exist_ok=True)

    def __call__(self, trainer, iteration):
        import jax.numpy as jnp

        from loans_tpu.insights.rendering import draw_boxes_on_image

        (boxes, _, scores), = self.evaluator.detect(
            trainer.loc_state, jnp.asarray(self.image[None])
        )
        gt = self.gt[np.abs(self.gt).sum(axis=1) > 0]
        canvas = draw_boxes_on_image(
            (self.image * 255).astype(np.uint8), boxes,
            gt_boxes=gt, scores=scores,
        )
        canvas.save(f"{self.out_dir}/{iteration}.png")


class _SyntheticSSDAdapter:
    """Labeled synthetic scenes -> encoded SSD train tuples."""

    def __init__(self, n, size, coder, seed=0, augment=True, asset_kw=None):
        from loans_tpu.data.ssd_augment import SSDTransform
        from loans_tpu.data.synthetic import SyntheticLocalizerDataset

        self.scenes = SyntheticLocalizerDataset(
            n, image_size=(size, size), seed=seed, labeled=True,
            output_dtype="uint8",  # 1/4 the HBM of float32 as a pool
            **(asset_kw or {}),
        )
        self.transform = SSDTransform(coder, size, seed=seed, augment=augment)

    def __len__(self):
        return len(self.scenes)

    def get_example(self, i):
        img, bbox, _ = self.scenes.get_example(i)
        return self.transform(img, bbox)


class _SyntheticValAdapter:
    """Labeled synthetic scenes -> (image, padded gt bboxes)."""

    def __init__(self, n, size, seed=0, asset_kw=None):
        from loans_tpu.data.synthetic import SyntheticLocalizerDataset

        self.scenes = SyntheticLocalizerDataset(
            n, image_size=(size, size), seed=seed, labeled=True,
            **(asset_kw or {}),
        )

    def __len__(self):
        return len(self.scenes)

    def get_example(self, i):
        img, bbox, _ = self.scenes.get_example(i)
        return img, np.asarray(bbox, np.float32).reshape(-1, 4)


class _ValAdapter:
    """gt json -> (image at SSD size, padded bboxes) with max_boxes."""

    def __init__(self, source, size, max_boxes=16):
        from loans_tpu.data.datasets import read_bbox_json

        self.pairs = read_bbox_json(source)
        self.size = size
        self.max_boxes = max_boxes

    def __len__(self):
        return len(self.pairs)

    def get_example(self, i):
        import cv2

        from loans_tpu.data.datasets import load_image

        path, flat = self.pairs[i]
        img = load_image(path, "RGB")
        h, w = img.shape[:2]
        img = (
            cv2.resize(img.astype(np.uint8), (self.size, self.size)).astype(
                np.float32
            )
            / 255.0
        )
        bbox = np.asarray(flat, np.float32).reshape(-1, 4) * np.array(
            [self.size / h, self.size / w] * 2, dtype=np.float32
        )
        out = np.zeros((self.max_boxes, 4), dtype=np.float32)
        out[: min(len(bbox), self.max_boxes)] = bbox[: self.max_boxes]
        return img, out


def main(argv=None):
    from loans_tpu.cli.train_localizer import _is_synthetic, _synthetic_n
    from loans_tpu.data import DataLoader, device_prefetch
    from loans_tpu.data.ssd_augment import SSDDataset
    from loans_tpu.evaluation.ssd_eval import SSDEvaluator
    from loans_tpu.models import SSD300, SSD512
    from loans_tpu.parallel import create_mesh, replicate, shard_batch
    from loans_tpu.train import Trainer, checkpoint, create_train_state
    from loans_tpu.train.ssd_steps import make_ssd_train_step, ssd_optimizer

    args = get_parser().parse_args(argv)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = (SSD300 if args.model == "ssd300" else SSD512)(
        n_fg_class=1, dtype=dtype
    )
    size = model.input_size
    coder = model.coder()

    timestamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    log_dir = os.path.join(args.log_dir, f"{timestamp}_{args.log_name}")
    os.makedirs(log_dir, exist_ok=True)
    model_name = args.model.upper()
    config = dict(vars(args))
    checkpoint.save_manifest(
        log_dir,
        {
            "localizer": {
                "model": model_name,
                "kwargs": {"n_fg_class": 1},
            },
            "snapshot_names": [model_name],
            "config": config,
        },
    )

    asset_kw = {}
    if args.synthetic_assets:
        asset_kw = dict(
            asset_seed=args.seed + 9973, n_assets=args.synthetic_assets
        )
    if _is_synthetic(args.train_file):
        train_ds = _SyntheticSSDAdapter(
            _synthetic_n(args.train_file, 256), size, coder,
            seed=args.seed, augment=not args.no_augment,
            asset_kw=asset_kw,
        )
    else:
        train_ds = SSDDataset(
            args.train_file, coder, size, seed=args.seed,
            augment=not args.no_augment,
        )
    if _is_synthetic(args.val_file):
        val_ds = _SyntheticValAdapter(
            _synthetic_n(args.val_file, 32), size, seed=args.seed + 1,
            asset_kw=asset_kw,
        )
    else:
        val_ds = _ValAdapter(args.val_file, size)

    mesh = create_mesh()
    if args.batch_size % mesh.devices.size:
        raise SystemExit(
            f"--batch-size {args.batch_size} not divisible by "
            f"{mesh.devices.size} devices"
        )
    state = create_train_state(
        model,
        jax.random.key(args.seed),
        jnp.zeros((2, size, size, 3)),
        ssd_optimizer(args.learning_rate),
        train=False,
    )
    if args.pretrained_model:
        params, _ = checkpoint.restore_params(
            args.pretrained_model, state.params
        )
        state = state.replace(params=params)
    state = replicate(mesh, state)

    use_device_data = args.device_data == "on" or (
        args.device_data == "auto" and _is_synthetic(args.train_file)
    )
    steps_per_call = 1
    if use_device_data:
        from loans_tpu.data.device_data import device_chunk_batches
        from loans_tpu.data.ssd_device import ssd_pooled_body
        from loans_tpu.train import make_pooled_train_step

        if not hasattr(train_ds, "scenes"):
            raise SystemExit(
                "--device-data on requires synthetic train data "
                "(raw scene pool); use --device-data off for gt json"
            )
        steps_per_call = args.steps_per_call or 8
        raw = train_ds.scenes  # SyntheticLocalizerDataset (raw scenes)
        scenes = np.stack([raw.get_example(i)[0] for i in range(len(raw))])
        boxes = np.stack(
            [raw.get_example(i)[1][0] for i in range(len(raw))]
        )[:, None, :].astype(np.float32)
        groups = {
            "train": {
                "scenes": scenes,
                "boxes": boxes,
                "valid": np.ones((len(raw), 1), bool),
            }
        }
        device_batches = device_chunk_batches(
            mesh, groups, args.batch_size, steps_per_call, seed=args.seed
        )
        step = make_pooled_train_step(
            ssd_pooled_body(
                model, coder, size, augment=not args.no_augment
            ),
            steps_per_call,
        )
    else:
        loader = DataLoader(
            train_ds, args.batch_size, repeat=True,
            num_workers=args.num_workers, seed=args.seed,
        )
        device_batches = device_prefetch(
            iter(loader), lambda b: shard_batch(mesh, b)
        )
        step = make_ssd_train_step(model)
    val_loader = DataLoader(
        val_ds, max(args.batch_size // 2, 1), shuffle=False,
        drop_last=True, num_workers=args.num_workers,
    )
    evaluator = SSDEvaluator(model, coder, max_batches=args.eval_batches)

    last_eval = [0]  # bucket 0 = before the first --eval-interval point

    def eval_fn(trainer, iteration):
        if not args.eval_interval:
            return {}
        bucket = iteration // args.eval_interval
        if bucket == last_eval[0]:
            return {}
        last_eval[0] = bucket
        return evaluator(trainer.loc_state, iter(val_loader))

    hooks = []
    if args.plot_interval > 0:
        from loans_tpu.train import Hook

        plot_img, plot_gt = val_ds.get_example(0)[:2]
        hooks.append(
            Hook(
                SSDPlotHook(evaluator, plot_img, plot_gt, log_dir),
                every=args.plot_interval,
                at_zero=True,
                name="ssd_plotter",
            )
        )

    trainer = Trainer(
        step,
        state,
        None,
        device_batches,
        log_dir,
        max_iterations=args.iterations,
        rng=jax.random.key(args.seed + 17),
        config=config,
        snapshot_interval=args.snapshot_interval,
        log_interval=args.log_interval,
        eval_fn=eval_fn,
        hooks=hooks,
        snapshot_names=(model_name,),
        steps_per_call=steps_per_call,
    )
    if args.resume:
        trainer.resume(loc_path=args.resume)
    print(f"training {model_name} in {log_dir}")
    trainer.run()
    return log_dir


if __name__ == "__main__":
    main()
