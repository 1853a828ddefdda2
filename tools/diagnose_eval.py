"""Diagnose what bounds val IoU/mAP: per-size-bin IoU + BN-stats
sensitivity of a trained snapshot.

Answers two round-2 questions (VERDICT items 1 and 6):
  * is the plateau a small-object problem? (IoU binned by gt box area)
  * how much do BatchNorm running stats move the eval-mode prediction?
    (snapshot stats vs re-estimated stats vs batch stats)

Usage: python tools/diagnose_eval.py <log_dir> [snapshot_iteration]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # usage: diagnose_eval.py <log_dir> [iteration] [val_seed asset_seed
    #        n_assets] [--hard]
    # --hard builds the hard benchmark world (distractor stamps + cluttered
    # background), matching a `--benchmark hard` training run — the same
    # "world kwargs must match the run" contract evaluate.py enforces.
    argv = [a for a in _sys.argv[1:] if a != "--hard"]
    hard = "--hard" in _sys.argv
    log_dir = argv[0]
    want_it = int(argv[1]) if len(argv) > 1 else None
    val_seed = int(argv[2]) if len(argv) > 2 else 2
    asset_kw = {}
    if len(argv) > 4:
        asset_kw = dict(asset_seed=int(argv[3]), n_assets=int(argv[4]))
    if hard:
        asset_kw["hard"] = True

    from loans_tpu.data.synthetic import SyntheticLocalizerDataset
    from loans_tpu.ops.geometry import bbox_iou
    from loans_tpu.utils.registry import build_model
    from loans_tpu.ops.geometry import corners_to_aabb, theta_corners
    from loans_tpu.train import adam_amsgrad, checkpoint, create_train_state
    from loans_tpu.train.steps import to_float01

    manifest = checkpoint.load_manifest(log_dir)
    cfg = manifest["localizer"]
    localizer = build_model(cfg["model"], **cfg["kwargs"])
    size = localizer.input_size

    snaps = checkpoint.list_snapshots(log_dir, "Localizer_")
    if want_it is not None:
        snaps = [s for s in snaps if s[0] == want_it]
    iteration, path = snaps[-1]
    print(f"snapshot: {path}")

    state = create_train_state(
        localizer, jax.random.key(0),
        jnp.zeros((1, size.height, size.width, 3)),
        adam_amsgrad(1e-3), train=False,
    )
    params, stats = checkpoint.restore_params(
        path, state.params, state.batch_stats
    )
    params, stats = jax.device_put((params, stats))

    val = SyntheticLocalizerDataset(
        512, image_size=tuple(size), seed=val_seed, labeled=True,
        output_dtype="uint8", **asset_kw,
    )
    images = np.stack([val.get_example(i)[0] for i in range(512)])
    gt = np.stack([val.get_example(i)[1][0] for i in range(512)])

    @jax.jit
    def fwd_eval(params, stats, imgs):
        _, theta = localizer.apply(
            {"params": params, "batch_stats": stats},
            to_float01(imgs), train=False,
        )
        return corners_to_aabb(theta_corners(theta), size, clip=True)

    @jax.jit
    def fwd_train_stats(params, stats, imgs):
        """train-mode normalization (per-batch stats), same weights."""
        (_, theta), _ = localizer.apply(
            {"params": params, "batch_stats": stats},
            to_float01(imgs), train=True, mutable=["batch_stats"],
            rngs={"rotation_dropout": jax.random.key(0)},
        )
        return corners_to_aabb(theta_corners(theta), size, clip=True)

    @jax.jit
    def warm(params, stats, imgs):
        _, upd = localizer.apply(
            {"params": params, "batch_stats": stats},
            to_float01(imgs), train=True, mutable=["batch_stats"],
            rngs={"rotation_dropout": jax.random.key(0)},
        )
        return upd["batch_stats"]

    def run(fwd, stats_in, label):
        ious = []
        for s in range(0, 512, 64):
            boxes = np.asarray(fwd(params, stats_in, images[s : s + 64]))
            for b, g in zip(boxes, gt[s : s + 64]):
                ious.append(float(np.asarray(bbox_iou(b[None], g[None]))[0, 0]))
        ious = np.asarray(ious)
        areas = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
        side = np.sqrt(areas)
        print(f"\n== {label} ==")
        print(f"mean IoU {ious.mean():.4f}   acc@0.5 {(ious > 0.5).mean():.4f}")
        hist, _ = np.histogram(ious, bins=10, range=(0.0, 1.0))
        print("  IoU histogram [0,1) deciles:", " ".join(str(int(c)) for c in hist))
        bins = [(0, 30), (30, 50), (50, 75), (75, 1000)]
        for lo, hi in bins:
            m = (side >= lo) & (side < hi)
            if m.sum():
                print(
                    f"  side [{lo:3d},{hi:4d}): n={int(m.sum()):3d}  "
                    f"IoU {ious[m].mean():.4f}  acc@0.5 "
                    f"{(ious[m] > 0.5).mean():.4f}"
                )
        return ious

    run(fwd_eval, stats, "eval mode, snapshot running stats")

    warmed = stats
    for s in range(0, 512, 64):
        warmed = warm(params, warmed, images[s : s + 64])
    run(fwd_eval, warmed, "eval mode, re-estimated stats (8 val batches)")

    run(fwd_train_stats, stats, "train-mode batch stats (upper bound)")


if __name__ == "__main__":
    main()
