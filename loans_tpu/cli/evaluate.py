"""Offline snapshot-sweep evaluation CLI (``evaluate.py`` parity).

Usage: ``python evaluate.py <gt> <model_dir> [prefix]`` — sweep all
``<prefix>*.msgpack`` snapshots in the log dir against the labeled
dataset, resumably (already-scored snapshots are skipped,
``--force-reset`` to restart), then plot metric curves and report the
best snapshot.
"""

from __future__ import annotations

import argparse


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="evaluate localizer snapshots")
    p.add_argument("gt", help="labeled dataset (csv/json), or "
                   "'synthetic[:N]'")
    p.add_argument("model_dir", help="training log dir (with manifest.json)")
    p.add_argument("snapshot_prefix", nargs="?", default="Localizer_")
    p.add_argument("--batch-size", "-b", type=int, default=8,
                   help="eval batch (the reference is locked to 1; jitted "
                   "fixed-shape batching lifts that)")
    p.add_argument("--iou-threshold", type=float, default=0.5)
    p.add_argument("--force-reset", action="store_true",
                   help="discard eval_results.json and re-evaluate all")
    p.add_argument("--assessor", "-a", action="store_true",
                   help="also score predicted crops with the assessor "
                   "(reference evaluate.py:213-214)")
    p.add_argument("--save-predictions", default=None, metavar="DIR",
                   help="render per-sample predictions (+gt) to DIR/<iter>/")
    p.add_argument("--deteval", default=None, metavar="DIR",
                   help="write deteval XML per snapshot to DIR")
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--bn-warmup", type=int, default=0, metavar="N",
                   help="re-estimate BatchNorm running stats from N "
                   "train-mode batches before scoring each snapshot "
                   "(rescues short runs with unwarmed stats)")
    p.add_argument("--seed", type=int, default=2,
                   help="seed for 'synthetic:N' gt (default 2 = the "
                   "train CLI's val split, seed+2 with seed 0)")
    p.add_argument("--synthetic-assets", type=int, default=0, metavar="N",
                   help="shared procedural asset world: N assets "
                   "(0 = legacy per-dataset assets)")
    p.add_argument("--benchmark", choices=["default", "hard"],
                   default="default",
                   help="synthetic world difficulty (must match the train "
                   "run's --benchmark): 'hard' adds distractor stamps, "
                   "cluttered backgrounds, wider scales")
    p.add_argument("--base-bboxes", default=None, metavar="JSON",
                   help="stamp sizes drawn from this bbox-annotation "
                   "JSON's gt distribution (must match the train run's "
                   "--base-bboxes; paste_and_crop_sheep.py:157-175)")
    p.add_argument("--asset-seed", type=int, default=None,
                   help="asset-world seed; a train run with seed S and "
                   "--synthetic-assets used S + 9973 (default: --seed - 2 "
                   "+ 9973, the localizer val convention)")
    return p


def main(argv=None):
    from loans_tpu.cli.train_localizer import _is_synthetic, _synthetic_n
    from loans_tpu.data import DataLoader, LabeledImageDataset, padded_collate
    from loans_tpu.data.synthetic import SyntheticLocalizerDataset
    from loans_tpu.evaluation import Evaluator

    args = get_parser().parse_args(argv)
    evaluator = Evaluator(
        args.model_dir,
        snapshot_prefix=args.snapshot_prefix,
        iou_threshold=args.iou_threshold,
        force_reset=args.force_reset,
        use_assessor=args.assessor,
    )
    size = evaluator.image_size
    if _is_synthetic(args.gt):
        asset_kw = {}
        if args.synthetic_assets:
            # localizer train CLI: val seed = seed+2, asset seed = seed+9973
            seed = (
                args.asset_seed
                if args.asset_seed is not None
                else args.seed - 2 + 9973
            )
            asset_kw = dict(
                asset_seed=seed,
                n_assets=args.synthetic_assets,
            )
        if args.benchmark == "hard":
            asset_kw["hard"] = True
        if args.base_bboxes:
            from loans_tpu.data.synthetic import load_base_bbox_sizes

            asset_kw["base_bboxes"] = load_base_bbox_sizes(args.base_bboxes)
        ds = SyntheticLocalizerDataset(
            _synthetic_n(args.gt, 64),
            image_size=tuple(size),
            seed=args.seed,
            labeled=True,
            **asset_kw,
        )
    else:
        ds = LabeledImageDataset(args.gt, image_size=tuple(size))

    def batches_factory():
        return iter(
            DataLoader(
                ds, args.batch_size, shuffle=False, drop_last=True,
                num_workers=args.num_workers, collate=padded_collate,
            )
        )

    evaluator.sweep(
        batches_factory,
        save_predictions=args.save_predictions,
        deteval_dir=args.deteval,
        bn_warmup=args.bn_warmup,
    )
    evaluator.plot()
    return evaluator.results


if __name__ == "__main__":
    main()
