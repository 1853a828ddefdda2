"""Synthetic assessor/localizer data: the paste-and-crop compositor.

Re-design of ``datasets/sheep/paste_and_crop_sheep.py``: paste an RGBA
"stamp" onto a background at a random size/position, then cut a crop whose
IoU with the pasted box is known — that (crop, IoU) pair supervises the
assessor. The IoU-stratified "zoom mode" cycles desired IoU through
{0.20, 0.25, ..., 1.0} (``paste_and_crop_sheep.py:13-14,47-48``) and
rejection-samples a matching crop; 30% of samples use a naive random zoom
(:141-144).

Additions over the reference:
  * an *in-memory* generator (no disk round trip) usable directly as a
    dataset — feeds the input pipeline at TPU speed;
  * procedural stamps/backgrounds (random blobs/gradients) so the full
    train/eval/bench path runs with zero external downloads — this powers
    the MNIST-style smoke mode (``train_sheep_localizer.py:94-96``) and
    the benchmark harness;
  * a localization dataset with ground-truth boxes (full scene + gt
    aabb) for IoU/mAP evaluation.
"""

from __future__ import annotations

import csv
import os
import random
from dataclasses import dataclass

import numpy as np
from PIL import Image

IOU_RANGE = [v / 100 for v in range(20, 105, 5)]  # paste_and_crop_sheep.py:13


def _bbox_iou_xyxy(a, b) -> float:
    x1 = max(a[0], b[0])
    y1 = max(a[1], b[1])
    x2 = min(a[2], b[2])
    y2 = min(a[3], b[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    area_a = max(0, a[2] - a[0]) * max(0, a[3] - a[1])
    area_b = max(0, b[2] - b[0]) * max(0, b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def make_procedural_stamp(
    rng: random.Random, size: int = 64
) -> Image.Image:
    """Random colored blob with alpha — a stand-in 'sheep stamp'."""
    img = Image.new("RGBA", (size, size), (0, 0, 0, 0))
    arr = np.zeros((size, size, 4), dtype=np.uint8)
    color = [rng.randint(60, 255) for _ in range(3)]
    n_blobs = rng.randint(2, 4)
    yy, xx = np.mgrid[0:size, 0:size]
    mask = np.zeros((size, size), dtype=bool)
    for _ in range(n_blobs):
        cy, cx = rng.randint(size // 4, 3 * size // 4), rng.randint(
            size // 4, 3 * size // 4
        )
        ry, rx = rng.randint(size // 6, size // 3), rng.randint(
            size // 6, size // 3
        )
        mask |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    for c in range(3):
        arr[..., c] = color[c]
    arr[..., 3] = mask.astype(np.uint8) * 255
    img = Image.fromarray(arr, "RGBA")
    return img


def make_procedural_distractor(
    rng: random.Random, size: int = 64
) -> Image.Image:
    """Wrong-class stamp: saturated ring/bar/triangle shapes.

    A disjoint shape family from :func:`make_procedural_stamp`'s blob
    class — pasted into hard-benchmark scenes but never labeled, so a
    detector that keys on "any saturated thing on a muted field" is
    penalized (the reference proves itself on real photos where sheep
    share the frame with rocks, fences, and people; the default
    benchmark has exactly one salient object per scene).
    """
    arr = np.zeros((size, size, 4), dtype=np.uint8)
    color = [rng.randint(60, 255) for _ in range(3)]
    yy, xx = np.mgrid[0:size, 0:size]
    cy, cx = rng.randint(size // 3, 2 * size // 3), rng.randint(
        size // 3, 2 * size // 3
    )
    kind = rng.choice(["ring", "bar", "tri"])
    if kind == "ring":
        r_out = rng.randint(size // 4, size // 2 - 2)
        r_in = rng.randint(r_out // 2, max(r_out - 3, r_out // 2 + 1))
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        mask = (d2 <= r_out**2) & (d2 >= r_in**2)
    elif kind == "bar":
        ang = rng.random() * np.pi
        thick = rng.randint(size // 10, size // 4)
        half_len = rng.randint(size // 3, size // 2)
        u = (xx - cx) * np.cos(ang) + (yy - cy) * np.sin(ang)
        v = -(xx - cx) * np.sin(ang) + (yy - cy) * np.cos(ang)
        mask = (np.abs(v) <= thick / 2) & (np.abs(u) <= half_len)
    else:  # triangle: intersection of three half-planes around (cy, cx)
        r = rng.randint(size // 3, size // 2 - 1)
        angles = sorted(rng.random() * 2 * np.pi for _ in range(3))
        pts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for a in angles]
        mask = np.ones((size, size), dtype=bool)
        for (x0, y0), (x1, y1) in zip(pts, pts[1:] + pts[:1]):
            # keep the side of edge (p0->p1) containing the centroid
            gx = sum(p[0] for p in pts) / 3 - x0
            gy = sum(p[1] for p in pts) / 3 - y0
            ex, ey = x1 - x0, y1 - y0
            side = ex * (yy - y0) - ey * (xx - x0)
            mask &= (side * (ex * gy - ey * gx)) >= 0
    for c in range(3):
        arr[..., c] = color[c]
    arr[..., 3] = mask.astype(np.uint8) * 255
    return Image.fromarray(arr, "RGBA")


def make_hard_background(
    rng: random.Random, size: tuple[int, int] = (256, 256)
) -> Image.Image:
    """Cluttered high-frequency background (hard benchmark).

    Full-value-range colored noise at stamp-ish spatial frequency plus a
    fine speckle layer — restores the visual clutter the default muted
    background deliberately removes (RESULTS.md round 1: full-spectrum
    backgrounds made the task adversarial and were toned down; the hard
    benchmark brings a controlled amount of that back).
    """
    w, h = size
    nprng = np.random.default_rng(rng.randrange(2**31))
    coarse = nprng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    # partially desaturate so stamps remain findable, but keep far more
    # chroma + value range than the default background
    mean = coarse.mean(axis=-1, keepdims=True)
    coarse = (0.3 * mean + 0.7 * coarse).astype(np.uint8)
    img = np.asarray(
        Image.fromarray(coarse, "RGB").resize((w, h), Image.BILINEAR),
        dtype=np.float32,
    )
    speckle = nprng.normal(0.0, 28.0, size=(h, w, 1)).astype(np.float32)
    img = np.clip(img + speckle, 0, 255).astype(np.uint8)
    return Image.fromarray(img, "RGB").convert("RGBA")


def load_base_bbox_sizes(path: str) -> list[tuple[int, int]]:
    """(w, h) sizes of every valid gt box in a bbox-annotation JSON.

    Port of ``paste_and_crop_sheep.py:157-175`` (``--base-bboxes``):
    stamps are resized to sizes that naturally occur in a real dataset
    instead of uniform draws. The JSON is the repo's bbox format — a
    list of ``{"image": ..., "bounding_boxes": [[y1, x1, y2, x2], ...]}``.
    Degenerate boxes are dropped; duplicates collapse (reference uses a
    set).
    """
    import json

    with open(path) as handle:
        data = json.load(handle)
    sizes = set()
    for item in data:
        for box in item.get("bounding_boxes", []):
            w, h = box[3] - box[1], box[2] - box[0]
            if w > 0 and h > 0:
                sizes.add((int(w), int(h)))
    if not sizes:
        raise ValueError(f"no valid bounding boxes in {path}")
    return sorted(sizes)


def make_procedural_background(
    rng: random.Random, size: tuple[int, int] = (256, 256)
) -> Image.Image:
    """Low-frequency muted background (no object-like structure).

    Low saturation and limited value range so the bright saturated
    stamps remain the only object-like structure — analogous to sheep
    on pasture, rather than a background full of stamp-colored blobs.
    """
    w, h = size
    base = rng.randint(70, 150)
    small = np.stack(
        [
            np.asarray(
                [
                    [
                        max(0, min(255, base + rng.randint(-35, 35)))
                        for _ in range(8)
                    ]
                    for _ in range(8)
                ],
                dtype=np.uint8,
            )
            for _ in range(3)
        ],
        axis=-1,
    )
    # pull channels toward their mean -> muted/gray-green tones
    mean = small.mean(axis=-1, keepdims=True)
    small = (0.6 * mean + 0.4 * small).astype(np.uint8)
    img = Image.fromarray(small, "RGB").resize((w, h), Image.BILINEAR)
    return img.convert("RGBA")


def iou_crop_box(
    rng: random.Random,
    image_size: tuple[int, int],
    bbox: np.ndarray,
    crop_width: int,
    crop_height: int,
    desired_iou: float,
) -> np.ndarray:
    """Sample a crop box near the paste bbox (``paste_and_crop_sheep.py:17-42``)."""
    width, height = image_size
    if desired_iou < 0.0:
        crop_x = rng.randint(0, max(0, width - crop_width))
        crop_y = rng.randint(0, max(0, height - crop_height))
    else:
        dev_w = int(crop_width // 2 * (1.0 - desired_iou))
        dev_h = int(crop_height // 2 * (1.0 - desired_iou))
        lo_x = max(int(bbox[0]) - dev_w, 0)
        hi_x = min(int(bbox[0]) + dev_w, width - crop_width)
        lo_y = max(int(bbox[1]) - dev_h, 0)
        hi_y = min(int(bbox[1]) + dev_h, height - crop_height)
        crop_x = rng.randint(lo_x, max(lo_x, hi_x))
        crop_y = rng.randint(lo_y, max(lo_y, hi_y))
    return np.array(
        [
            crop_x,
            crop_y,
            min(crop_x + crop_width, width),
            min(crop_y + crop_height, height),
        ]
    )


@dataclass
class PasteResult:
    image: Image.Image  # composited RGBA scene
    paste_bbox: np.ndarray  # (x1, y1, x2, y2) of the stamp


class PasteAndCropGenerator:
    """IoU-labeled crop sampler (assessor supervision).

    Each ``sample()`` composites a stamp on a background, then returns
    (crop_rgb_float01_HWC, iou_label). Stratified over ``IOU_RANGE`` in
    zoom mode, with a 30% naive-zoom mixture, like the reference tool.
    """

    def __init__(
        self,
        stamps: list[Image.Image] | None = None,
        backgrounds: list[Image.Image] | None = None,
        image_size: tuple[int, int] = (224, 224),
        output_size: tuple[int, int] = (75, 75),
        seed: int = 0,
        n_procedural: int = 16,
        asset_seed: int | None = None,
        low_iou_fraction: float = 0.0,
        hard: bool = False,
        base_bboxes: list[tuple[int, int]] | None = None,
    ):
        """``asset_seed`` decouples the procedural stamp/background
        *assets* from the sampling stream: generators with the same
        asset_seed (and n_procedural) share one visual world while
        drawing independent scenes/crops. This mirrors the reference
        setting, where the assessor's paste_and_crop templates are the
        same object class the unlabeled video frames contain
        (``datasets/sheep/paste_and_crop_sheep.py``) — with per-dataset
        disjoint assets the assessor is asked to score objects it has
        never seen, which measurably stalls the localizer."""
        self.rng = random.Random(seed)
        asset_rng = (
            random.Random(asset_seed) if asset_seed is not None else self.rng
        )
        self.hard = hard
        self.base_bboxes = base_bboxes
        self.stamps = stamps or [
            make_procedural_stamp(asset_rng) for _ in range(n_procedural)
        ]
        make_bg = make_hard_background if hard else make_procedural_background
        self.backgrounds = backgrounds or [
            make_bg(asset_rng) for _ in range(n_procedural)
        ]
        # wrong-class stamps, same asset world, never labeled (hard only)
        self.distractors = (
            [make_procedural_distractor(asset_rng) for _ in range(n_procedural)]
            if hard
            else []
        )
        self.image_size = image_size
        self.low_iou_fraction = low_iou_fraction
        self.output_size = output_size
        self._iou_index = -1

    def spawn(self, seed) -> "PasteAndCropGenerator":
        """Lightweight copy sharing the (expensive) stamp/background
        assets but with an independent RNG stream — lets dataset
        pre-generation run deterministically across worker threads."""
        import copy

        clone = copy.copy(self)
        clone.rng = random.Random(seed)
        clone._iou_index = clone.rng.randrange(len(IOU_RANGE))
        return clone

    # -- compositing ------------------------------------------------------
    def _stamp_size(self, background: Image.Image) -> tuple[int, int]:
        """Target stamp size in resized-image pixels.

        ``base_bboxes`` draws a real (w, h) and maps it through the
        background->image resize factors (``paste_and_crop_sheep.py:
        109-127``); otherwise a uniform draw — [w/15, w/2] like the
        reference (:113-116), widened to [w/20, w/1.8] in hard mode.
        """
        rng = self.rng
        w, h = self.image_size
        if self.base_bboxes is not None:
            bw, bh = rng.choice(self.base_bboxes)
            fx = w / background.width
            fy = h / background.height
            sw = max(2, min(int(bw * fx), w))
            sh = max(2, min(int(bh * fy), h))
            return sw, sh
        if self.hard:
            return (
                rng.randint(w // 20, int(w / 1.8)),
                rng.randint(h // 20, int(h / 1.8)),
            )
        return rng.randint(w // 15, w // 2), rng.randint(h // 15, h // 2)

    def paste(self, stamp_index: int | None = None) -> PasteResult:
        """Composite one scene; ``stamp_index`` pins the stamp identity
        (classifier pretraining labels scenes by stamp class)."""
        rng = self.rng
        background = rng.choice(self.backgrounds)
        stamp = (
            self.stamps[stamp_index]
            if stamp_index is not None
            else rng.choice(self.stamps)
        )
        if rng.random() >= 0.5:
            stamp = stamp.transpose(Image.FLIP_LEFT_RIGHT)
        w, h = self.image_size
        stamp = stamp.resize(self._stamp_size(background), Image.LANCZOS)
        image = background.resize(self.image_size, Image.LANCZOS)
        paste_x = rng.randint(0, w - stamp.width)
        paste_y = rng.randint(0, h - stamp.height)
        bbox = np.array(
            [paste_x, paste_y, paste_x + stamp.width, paste_y + stamp.height]
        )
        if self.distractors:
            # wrong-class clutter UNDER the target (never occludes it);
            # rejection keeps distractors from sitting on the gt box so
            # the label stays unambiguous
            layer = Image.new("RGBA", image.size)
            for _ in range(rng.randint(1, 3)):
                d = rng.choice(self.distractors)
                d = d.resize(
                    (rng.randint(w // 20, w // 2), rng.randint(h // 20, h // 2)),
                    Image.LANCZOS,
                )
                for _ in range(10):
                    dx = rng.randint(0, w - d.width)
                    dy = rng.randint(0, h - d.height)
                    dbox = [dx, dy, dx + d.width, dy + d.height]
                    if _bbox_iou_xyxy(dbox, bbox) < 0.15:
                        layer.paste(d, (dx, dy))
                        break
            image = Image.alpha_composite(image, layer)
        layer = Image.new("RGBA", image.size)
        layer.paste(stamp, (paste_x, paste_y))
        out = Image.alpha_composite(image, layer)
        return PasteResult(out, bbox)

    # -- crops ------------------------------------------------------------
    def _next_desired_iou(self) -> float:
        self._iou_index = (self._iou_index + 1) % len(IOU_RANGE)
        return min(IOU_RANGE[self._iou_index], 1.0)

    def iou_crop_sample(self, scene: PasteResult):
        """Rejection-sample a crop BOX matching the next stratified IoU
        (``paste_and_crop_sheep.py:45-81``); returns (box, iou)."""
        rng = self.rng
        desired = self._next_desired_iou()
        bbox = scene.paste_bbox
        bw, bh = bbox[2] - bbox[0], bbox[3] - bbox[1]
        sw, sh = scene.image.size
        max_dev = 1.0 - desired
        for _ in range(400):
            if desired < 0.3:
                cw = int(min(bw + (1 - desired) * 10 * bw, sw))
                ch = int(min(bh + (1 - desired) * 10 * bh, sh))
            else:
                cw = rng.randint(
                    max(int(bw - bw * max_dev), 1), int(bw + bw * max_dev)
                )
                ch = rng.randint(
                    max(int(bh - bh * max_dev), 1), int(bh + bh * max_dev)
                )
            cw, ch = min(cw, sw), min(ch, sh)
            crop = iou_crop_box(rng, (sw, sh), bbox, cw, ch, desired)
            iou = _bbox_iou_xyxy(crop, bbox)
            if desired - 0.05 < iou <= desired:
                return crop, iou
        # Fall back to whatever the last attempt produced.
        return crop, iou

    def iou_crop(self, scene: PasteResult):
        """PIL-pipeline crop for the next stratified IoU."""
        crop, iou = self.iou_crop_sample(scene)
        return scene.image.crop(tuple(crop)), iou

    def naive_zoom_sample(self, scene: PasteResult):
        """Random zoom BOX containing the stamp
        (``paste_and_crop_sheep.py:84-106``); returns (box, iou)."""
        rng = self.rng
        bbox = scene.paste_bbox
        bw, bh = bbox[2] - bbox[0], bbox[3] - bbox[1]
        sw, sh = scene.image.size
        zoom = rng.random() * 10 + 0.3
        cw = min(bw + zoom * bw, sw)
        ch = min(bh + zoom * bh, sh)
        ins_max = [min(bbox[0], sw - cw), min(bbox[1], sh - ch)]
        ins_min = [max(bbox[2] - cw, 0), max(bbox[3] - ch, 0)]
        for i in range(2):
            if ins_max[i] < ins_min[i]:
                ins_max[i] = ins_min[i]
        point = [
            int(mi + rng.random() * (ma - mi))
            for mi, ma in zip(ins_min, ins_max)
        ]
        crop = [point[0], point[1], point[0] + cw, point[1] + ch]
        # reference labels the IoU of the un-rounded crop
        # (paste_and_crop_sheep.py:84-106), then crops integer pixels
        iou = _bbox_iou_xyxy(crop, bbox)
        return np.array([int(v) for v in crop]), iou

    def naive_zoom(self, scene: PasteResult):
        """PIL-pipeline naive-zoom crop."""
        crop, iou = self.naive_zoom_sample(scene)
        return scene.image.crop(tuple(int(v) for v in crop)), iou

    def random_crop_sample(self, scene: PasteResult):
        """Unconstrained random crop BOX — mostly IoU ~ 0 (background).

        The stratified sampler never emits IoU < 0.2 (``IOU_RANGE``
        starts at 0.2, matching ``paste_and_crop_sheep.py:13-14``) and
        naive zoom always contains the stamp, so without these the
        assessor never sees object-free crops; its response there is
        unconstrained (~0.5 measured) and the localizer exploits that
        hole by parking on background. Labeled with the true IoU like
        every other crop.
        """
        rng = self.rng
        sw, sh = scene.image.size
        cw = rng.randint(max(sw // 10, 2), int(sw * 0.9))
        ch = rng.randint(max(sh // 10, 2), int(sh * 0.9))
        x = rng.randint(0, sw - cw)
        y = rng.randint(0, sh - ch)
        crop = np.array([x, y, x + cw, y + ch])
        return crop, _bbox_iou_xyxy(crop, scene.paste_bbox)

    def _choose_crop(self, scene: PasteResult):
        r = self.rng.random()
        if r < self.low_iou_fraction:
            return self.random_crop_sample(scene)
        if r < self.low_iou_fraction + 0.3 * (1 - self.low_iou_fraction):
            return self.naive_zoom_sample(scene)
        return self.iou_crop_sample(scene)

    def sample_box(self) -> tuple[np.ndarray, np.ndarray, float]:
        """One scene + crop box + IoU label, crop NOT rendered.

        Used by the STN-pipeline assessor dataset: the crop is produced
        later by the separable STN sampler — the exact operator the
        localizer uses — so the assessor trains on the distribution it
        scores (no PIL-vs-STN domain gap)."""
        scene = self.paste()
        box, iou = self._choose_crop(scene)
        arr = np.asarray(scene.image.convert("RGB"), dtype=np.uint8)
        return arr, np.asarray(box, dtype=np.float32), float(iou)

    def sample(self) -> tuple[np.ndarray, float]:
        scene = self.paste()
        box, iou = self._choose_crop(scene)
        crop = scene.image.crop(tuple(int(v) for v in box))
        crop = crop.convert("RGB").resize(self.output_size, Image.BILINEAR)
        return np.asarray(crop, dtype=np.uint8), float(iou)

    def scene_with_bbox(self) -> tuple[np.ndarray, np.ndarray]:
        """Full composited scene + gt box (y1, x1, y2, x2) — for
        localizer training images and IoU/mAP eval."""
        scene = self.paste()
        arr = (
            np.asarray(scene.image.convert("RGB"), dtype=np.uint8)
        )
        x1, y1, x2, y2 = scene.paste_bbox
        return arr, np.array([y1, x1, y2, x2], dtype=np.float32)


def _parallel_generate(base: PasteAndCropGenerator, n: int, seed, fn):
    """Deterministic thread-parallel pre-generation: the work splits
    into per-chunk generators (``spawn``), so results do not depend on
    thread scheduling. PIL's C paths release the GIL."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    workers = min(8, os.cpu_count() or 1)
    chunks = np.array_split(np.arange(n), workers * 4)

    def run(chunk_id):
        g = base.spawn(hash((seed, int(chunk_id))) & 0x7FFFFFFF)
        return [fn(g) for _ in range(len(chunks[chunk_id]))]

    with ThreadPoolExecutor(workers) as pool:
        parts = list(pool.map(run, range(len(chunks))))
    return [item for part in parts for item in part]


def _cache_key(kind: str, **kw) -> str:
    import hashlib
    import json

    blob = json.dumps({"kind": kind, **kw}, sort_keys=True)
    return f"{kind}-{hashlib.sha1(blob.encode()).hexdigest()[:16]}.npz"


def cached_synthetic(cache_dir: str | None, kind: str, build, **kw):
    """Disk-cache the pre-generated arrays of a synthetic dataset.

    Generating a 32k-crop assessor pool costs ~10-15 min of host CPU
    and is fully determined by its configuration — every run with the
    same (seed, asset world, sizes, fractions) regenerates identical
    data. ``build(items=None)`` constructs the dataset; on a cache hit
    it is called with the stored items and must skip generation.
    ``cache_dir=None`` disables caching. ``kw`` must contain every
    config value the data depends on — it IS the cache key.
    """
    if not cache_dir:
        return build(items=None)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, _cache_key(kind, **kw))
    if os.path.exists(path):
        with np.load(path, allow_pickle=False) as z:
            cols = [list(z[f"col{i}"]) for i in range(int(z["ncols"]))]
        return build(items=list(zip(*cols)))
    ds = build(items=None)
    cols = list(zip(*ds.items))
    arrays = {"ncols": np.asarray(len(cols))}
    for i, col in enumerate(cols):
        arrays[f"col{i}"] = np.stack([np.asarray(v) for v in col])
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    return ds


class SyntheticAssessorDataset:
    """Fixed-size dataset of pre-generated (crop, iou) pairs.

    ``output_dtype='uint8'`` returns raw bytes (4x less host->device
    bandwidth; the jitted train step normalizes on device).

    ``crop_pipeline='stn'`` renders the crops with the production STN
    separable sampler (``ops/stn.py``) instead of PIL crop+resize. PIL's
    resize antialiases; the STN bilinear point-samples — an assessor
    trained on PIL crops systematically over-scores the localizer's STN
    crops (measured +0.1-0.3 in round 2), which caps weakly-supervised
    quality. 'stn' trains the assessor on the exact distribution it
    scores during the alternating update. 'pil' is reference parity
    (``paste_and_crop_sheep.py``).
    """

    def __init__(self, n: int, output_size=(75, 75), image_size=(224, 224), seed=0,
                 output_dtype="float32", crop_pipeline="pil",
                 asset_seed=None, n_assets=16, low_iou_fraction=0.0,
                 hard=False, base_bboxes=None, items=None):
        self.output_dtype = output_dtype
        if items is not None:  # pre-generated (cached_synthetic)
            self.items = items
            return
        gen = PasteAndCropGenerator(
            image_size=image_size,
            output_size=(output_size[1], output_size[0]),
            seed=seed,
            asset_seed=asset_seed,
            n_procedural=n_assets,
            low_iou_fraction=low_iou_fraction,
            hard=hard,
            base_bboxes=base_bboxes,
        )
        if crop_pipeline == "stn":
            triples = _parallel_generate(
                gen, n, seed, lambda g: g.sample_box()
            )
            crops = _render_stn_crops(
                triples, (output_size[0], output_size[1])
            )
            self.items = [
                (crop, iou) for crop, (_, _, iou) in zip(crops, triples)
            ]
        elif crop_pipeline == "pil":
            self.items = _parallel_generate(
                gen, n, seed, lambda g: g.sample()
            )
        else:
            raise ValueError(f"unknown crop_pipeline: {crop_pipeline!r}")

    def __len__(self):
        return len(self.items)

    def get_example(self, i):
        img, iou = self.items[i]
        if self.output_dtype == "float32":
            img = img.astype(np.float32) / 255.0
        return img, np.asarray([iou], dtype=np.float32)

    def __getitem__(self, i):
        return self.get_example(i)


def _render_stn_crops(triples, out_hw) -> list[np.ndarray]:
    """Batch-render (scene, box) pairs to uint8 crops with the separable
    STN sampler — the exact operator the localizer applies."""
    import jax
    import jax.numpy as jnp

    from loans_tpu.ops.geometry import Size, box_to_theta
    from loans_tpu.ops.stn import spatial_transform

    h, w = out_hw
    size = Size(*triples[0][0].shape[:2])

    @jax.jit
    def render(scenes_u8, boxes):
        scenes = scenes_u8.astype(jnp.float32) / 255.0
        theta = box_to_theta(boxes, size)
        crops = spatial_transform(
            scenes, theta, Size(h, w), method="separable"
        )
        return jnp.clip(jnp.round(crops * 255.0), 0, 255).astype(jnp.uint8)

    out: list[np.ndarray] = []
    batch = 256
    n = len(triples)
    for start in range(0, n, batch):
        part = triples[start : start + batch]
        # pad the tail so the jit sees one static shape
        pad = batch - len(part)
        scenes = np.stack(
            [t[0] for t in part] + [part[-1][0]] * pad
        )
        boxes = np.stack(
            [t[1] for t in part] + [part[-1][1]] * pad
        )
        crops = np.asarray(render(scenes, boxes))
        out.extend(crops[: len(part)])
    return out


class SyntheticLocalizerDataset:
    """Fixed-size dataset of full scenes (+ gt boxes when labeled)."""

    def __init__(self, n: int, image_size=(224, 224), seed=0, labeled=False,
                 output_dtype="float32", asset_seed=None, n_assets=16,
                 hard=False, base_bboxes=None, items=None):
        self.labeled = labeled
        self.output_dtype = output_dtype
        if items is not None:  # pre-generated (cached_synthetic)
            self.items = items
            return
        gen = PasteAndCropGenerator(
            image_size=image_size, seed=seed,
            asset_seed=asset_seed, n_procedural=n_assets,
            hard=hard, base_bboxes=base_bboxes,
        )
        self.items = _parallel_generate(
            gen, n, seed, lambda g: g.scene_with_bbox()
        )

    def __len__(self):
        return len(self.items)

    def get_example(self, i):
        img, bbox = self.items[i]
        if self.output_dtype == "float32":
            img = img.astype(np.float32) / 255.0
        if self.labeled:
            return img, bbox[None, :], np.zeros((1,), dtype=np.float32)
        return img

    def __getitem__(self, i):
        return self.get_example(i)


def generate_dataset(
    destination: str,
    num_samples: int,
    stamps: list[str] | None = None,
    background_dir: str | None = None,
    image_size=(224, 224),
    output_size=(75, 75),
    zoom_mode: bool = True,
    seed: int = 0,
    low_iou_fraction: float = 0.0,
    base_bboxes: str | None = None,
):
    """Offline tool parity: write ``images/<i>.png`` + tab-separated
    ``images.csv`` with IoU labels (``paste_and_crop_sheep.py:178-228``).

    ``base_bboxes``: path to a bbox-annotation JSON; stamps are resized
    to the real gt-box size distribution (:111,157-175)."""
    stamp_imgs = (
        [Image.open(s).convert("RGBA") for s in stamps] if stamps else None
    )
    bg_imgs = None
    if background_dir:
        bg_imgs = [
            Image.open(os.path.join(background_dir, f)).convert("RGBA")
            for f in sorted(os.listdir(background_dir))
        ]
    gen = PasteAndCropGenerator(
        stamps=stamp_imgs,
        backgrounds=bg_imgs,
        image_size=tuple(image_size),
        output_size=tuple(output_size),
        seed=seed,
        low_iou_fraction=low_iou_fraction,
        base_bboxes=(
            load_base_bbox_sizes(base_bboxes) if base_bboxes else None
        ),
    )
    img_dir = os.path.join(destination, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i in range(num_samples):
        if zoom_mode:
            arr, label = gen.sample()  # uint8 HWC
            rows.append([f"images/{i}.png", format(label, ".4f")])
        else:
            scene = gen.paste()
            crop = scene.image.crop(tuple(scene.paste_bbox)).convert("RGB")
            crop = crop.resize(tuple(output_size), Image.BILINEAR)
            arr = np.asarray(crop, dtype=np.uint8)
            rows.append([f"images/{i}.png"])
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.png"))
    with open(os.path.join(destination, "images.csv"), "w") as handle:
        csv.writer(handle, delimiter="\t").writerows(rows)
    return os.path.join(destination, "images.csv")
