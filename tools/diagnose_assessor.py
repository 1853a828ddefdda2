"""Assessor calibration diagnostic: score vs TRUE IoU, PIL crops vs
STN-resampled crops (VERDICT r1 item 1 root-causing).

In the round-2 runs the localizer's crops score y_fake ~ 0.75 while
their true IoU is ~ 0.48 — the assessor overestimates them by ~0.27.
Two candidate causes:
  * domain gap: the assessor trains on PIL crop+resize images
    (paste_and_crop parity) but scores STN bilinear-resampled crops;
  * adversarial drift: the localizer ascends the assessor's score
    surface into off-manifold regions (inherent GAN dynamics).

This tool separates them: for a grid of KNOWN-IoU crop boxes it scores
(a) the PIL-pipeline crop and (b) the STN separable-sampler crop of the
same box, and prints mean score per true-IoU bin for both. If (b) reads
systematically higher than (a), the gap is the pipeline, and the fix is
training the assessor on STN-generated crops.

Usage: python tools/diagnose_assessor.py <log_dir> [snapshot_iteration]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def crop_theta(box, img_h, img_w):
    """Affine theta whose axis-aligned STN crop equals pixel box
    (x1, y1, x2, y2) — the production operator, so the diagnostic
    measures exactly what the localizer applies."""
    from loans_tpu.ops.geometry import Size, box_to_theta

    return np.asarray(
        box_to_theta(np.asarray(box, dtype=np.float32), Size(img_h, img_w))
    )


def main():
    # usage: diagnose_assessor.py <log_dir> [iteration] [asset_seed n_assets]
    log_dir = _sys.argv[1]
    want_it = int(_sys.argv[2]) if len(_sys.argv) > 2 else None
    asset_kw = {}
    if len(_sys.argv) > 4:
        asset_kw = dict(
            asset_seed=int(_sys.argv[3]), n_procedural=int(_sys.argv[4])
        )

    from loans_tpu.data.synthetic import (
        PasteAndCropGenerator,
        _bbox_iou_xyxy,
    )
    from loans_tpu.models import ResnetAssessor
    from loans_tpu.ops import Size
    from loans_tpu.ops.stn import spatial_transform
    from loans_tpu.train import checkpoint

    assessor = ResnetAssessor()
    snaps = checkpoint.list_snapshots(log_dir, "ResnetAssessor_")
    if want_it is not None:
        snaps = [s for s in snaps if s[0] == want_it]
    _, path = snaps[-1]
    print(f"assessor snapshot: {path}")
    a_vars = assessor.init(jax.random.key(0), jnp.zeros((1, 75, 75, 3)))
    params, _ = checkpoint.restore_params(path, dict(a_vars["params"]))
    params = jax.device_put(params)

    score_fn = jax.jit(
        lambda imgs: assessor.apply({"params": params}, imgs)[:, 0]
    )
    stn_fn = jax.jit(
        lambda imgs, theta: spatial_transform(
            imgs, theta, Size(75, 75), method="separable"
        )
    )

    gen = PasteAndCropGenerator(image_size=(224, 224), seed=123, **asset_kw)
    rng = np.random.default_rng(0)
    by_bin = {}
    for _ in range(512):
        scene = gen.paste()
        bbox = scene.paste_bbox  # (x1, y1, x2, y2)
        bw, bh = bbox[2] - bbox[0], bbox[3] - bbox[1]
        # random jittered crop around the stamp
        jit = rng.uniform(0.0, 1.2)
        cw = int(np.clip(bw * rng.uniform(1 - jit * 0.5, 1 + jit), 4, 224))
        ch = int(np.clip(bh * rng.uniform(1 - jit * 0.5, 1 + jit), 4, 224))
        cx = int(
            np.clip(bbox[0] + rng.uniform(-jit, jit) * bw, 0, 224 - cw)
        )
        cy = int(
            np.clip(bbox[1] + rng.uniform(-jit, jit) * bh, 0, 224 - ch)
        )
        crop_box = (cx, cy, cx + cw, cy + ch)
        iou = _bbox_iou_xyxy(np.array(crop_box), bbox)

        scene_rgb = np.asarray(
            scene.image.convert("RGB"), dtype=np.float32
        ) / 255.0
        pil = (
            np.asarray(
                scene.image.crop(crop_box)
                .convert("RGB")
                .resize((75, 75), Image.BILINEAR),
                dtype=np.float32,
            )
            / 255.0
        )
        theta = crop_theta(crop_box, 224, 224)
        stn = np.asarray(
            stn_fn(scene_rgb[None], jnp.asarray(theta)[None])
        )[0]
        s_pil = float(score_fn(pil[None])[0])
        s_stn = float(score_fn(stn[None])[0])
        b = min(int(iou * 10), 9)
        by_bin.setdefault(b, []).append((iou, s_pil, s_stn))

    print(f"{'true IoU bin':>14s} {'n':>4s} {'mean IoU':>9s} "
          f"{'score(PIL)':>11s} {'score(STN)':>11s} {'gap':>7s}")
    for b in sorted(by_bin):
        rows = np.asarray(by_bin[b])
        print(
            f"  [{b / 10:.1f},{(b + 1) / 10:.1f}) {len(rows):4d} "
            f"{rows[:, 0].mean():9.3f} {rows[:, 1].mean():11.3f} "
            f"{rows[:, 2].mean():11.3f} "
            f"{(rows[:, 2] - rows[:, 1]).mean():7.3f}"
        )


if __name__ == "__main__":
    main()
