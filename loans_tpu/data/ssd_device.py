"""On-device SSD augmentation + multibox encoding (pooled train path).

The reference's SSD input pipeline is an all-host 5-step ``Transform``
(``schaaaafrichter/train.py:56-115``: photometric distort, mean-filled
expand, IoU-constrained crop, resize, flip, then ``coder.encode``).
Measured on this box it costs ~45 ms/sample single-thread — a 10-30
img/s ceiling that starves a chip running the SSD300 step at thousands
of img/s. This module re-expresses the whole pipeline as device math so
the scenes live in HBM (``data/device_data``) and every step augments +
encodes its gathered batch inside the jitted scan:

  * photometric jitter — the same label-free transforms as
    ``device_augment.augment_crops``;
  * expand + crop + resize — collapsed into ONE axis-aligned affine
    window per sample, rendered by the separable MXU sampler
    (``ops/stn.py``). Expand is a window larger than the image
    (out-of-bounds reads mean-filled), crop is a smaller one; the IoU
    constraint is emulated by scoring V candidate windows per sample
    and taking the first that satisfies a constraint drawn from
    chainercv's {none, 0.1, 0.3, 0.5, 0.7, 0.9} (identity fallback);
  * flip — image mirror + box coordinate flip;
  * multibox encoding — vectorized chainercv ``MultiboxCoder.encode``
    semantics (argmax matching, 0.5 IoU threshold, force-matched best
    anchor per gt, variance-scaled offsets) over the batch.

Deviations from chainercv, documented: candidate search is V draws
(not a 50-trial rejection loop), and expand ratio/crop scale compose
into one window instead of two sequential ones — the support of window
scales [0.3, 4.0] and offsets is the same.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from loans_tpu.data.device_augment import photometric as _photometric
from loans_tpu.ops.geometry import Size, box_to_theta
from loans_tpu.ops.stn import sample_separable

# chainercv random_crop_with_bbox_constraints constraint menu; -1 = none
CONSTRAINTS = (-1.0, 0.1, 0.3, 0.5, 0.7, 0.9)
MEAN_FILL = (123.0, 117.0, 104.0)  # random_expand fill, RGB /255 applied


def pairwise_iou_yxyx(a: jax.Array, b: jax.Array) -> jax.Array:
    """(K, 4) x (R, 4) -> (K, R) IoU, yxyx convention (device)."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = jnp.prod(b[:, 2:] - b[:, :2], axis=1)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def encode_batch(
    default_cychw: jax.Array,
    default_yxyx: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    labels: jax.Array | None = None,
    variance=(0.1, 0.2),
    iou_thresh: float = 0.5,
):
    """Batched device-side ``MultiboxCoder.encode`` (``ops/multibox.py``).

    Args:
      default_cychw / default_yxyx: (K, 4) anchor grids (both layouts).
      boxes: (N, R, 4) normalized yxyx gt boxes (padded).
      valid: (N, R) bool mask of real boxes.
      labels: (N, R) int 0-based classes (default all 0).

    Returns:
      (mb_loc (N, K, 4), mb_conf (N, K) int32).
    """
    n, r = boxes.shape[:2]
    if labels is None:
        labels = jnp.zeros((n, r), dtype=jnp.int32)

    def one(b, v, lab):
        iou = pairwise_iou_yxyx(default_yxyx, b)  # (K, R)
        iou = jnp.where(v[None, :], iou, -1.0)
        index = jnp.argmax(iou, axis=1)  # (K,)
        best = jnp.max(iou, axis=1)
        masked = best >= iou_thresh
        # force-match: the best anchor of each (valid) gt is positive.
        # Sequential loop matches the reference's numpy assignment order
        # on duplicate anchors (R is small and static).
        best_anchor = jnp.argmax(iou, axis=0)  # (R,)
        for i in range(r):
            ba = best_anchor[i]
            masked = masked.at[ba].set(
                jnp.where(v[i], True, masked[ba])
            )
            index = index.at[ba].set(jnp.where(v[i], i, index[ba]))

        matched = b[index]  # (K, 4)
        cy = (matched[:, :2] + matched[:, 2:]) / 2
        hw = matched[:, 2:] - matched[:, :2]
        d_cy = default_cychw[:, :2]
        d_hw = default_cychw[:, 2:]
        loc = jnp.concatenate(
            [
                (cy - d_cy) / (variance[0] * d_hw),
                jnp.log(jnp.maximum(hw, 1e-8) / d_hw) / variance[1],
            ],
            axis=1,
        )
        any_valid = jnp.any(v)
        conf = jnp.where(
            masked & any_valid, lab[index].astype(jnp.int32) + 1, 0
        )
        loc = jnp.where((masked & any_valid)[:, None], loc, 0.0)
        return loc.astype(jnp.float32), conf

    return jax.vmap(one)(boxes, valid, labels)



def ssd_augment_batch(
    rng: jax.Array,
    scenes: jax.Array,
    boxes: jax.Array,
    valid: jax.Array,
    out_size: int,
    n_candidates: int = 8,
):
    """Full SSD augmentation on device.

    Args:
      rng: PRNG key.
      scenes: (N, S, S, 3) float [0, 1].
      boxes: (N, R, 4) pixel yxyx gt boxes (padded).
      valid: (N, R) bool.
      out_size: output image side (e.g. 300).

    Returns:
      (images (N, out, out, 3), boxes_out (N, R, 4) pixel yxyx in the
      output frame, valid_out (N, R)).
    """
    n, s = scenes.shape[0], scenes.shape[1]
    r = boxes.shape[1]
    v = n_candidates
    keys = jax.random.split(rng, 8)
    (k_photo, k_expand, k_scale, k_ar, k_pos, k_con, k_flip, k_ratio) = keys

    scenes = _photometric(k_photo, scenes)  # flip handled below (boxes)

    # -- candidate windows -------------------------------------------------
    expand = jax.random.bernoulli(k_expand, 0.5, (n, v))
    ratio = jnp.where(
        expand, jax.random.uniform(k_ratio, (n, v), minval=1.0, maxval=4.0), 1.0
    )
    cs = jax.random.uniform(k_scale, (n, v), minval=0.3, maxval=1.0)
    f = cs * ratio  # window side factor in [0.3, 4.0]
    ar_lo = jnp.maximum(0.5, cs * cs)
    ar_hi = jnp.minimum(2.0, 1.0 / (cs * cs))
    ar = jnp.exp(
        jax.random.uniform(k_ar, (n, v))
        * (jnp.log(ar_hi) - jnp.log(ar_lo))
        + jnp.log(ar_lo)
    )
    ch = f / jnp.sqrt(ar) * s
    cw = f * jnp.sqrt(ar) * s
    uy, ux = jax.random.uniform(k_pos, (2, n, v))
    y0 = jnp.minimum(0.0, s - ch) + uy * jnp.abs(s - ch)
    x0 = jnp.minimum(0.0, s - cw) + ux * jnp.abs(s - cw)
    cand = jnp.stack([y0, x0, y0 + ch, x0 + cw], axis=-1)  # (N, V, 4) yxyx

    # -- IoU-constraint selection -----------------------------------------
    con = jnp.asarray(CONSTRAINTS)[
        jax.random.randint(k_con, (n,), 0, len(CONSTRAINTS))
    ]
    iou = jax.vmap(pairwise_iou_yxyx)(cand, boxes)  # (N, V, R)
    iou = jnp.where(valid[:, None, :], iou, jnp.inf)  # ignore padding
    min_iou = jnp.min(iou, axis=2)  # (N, V); inf when no valid gt
    sat = min_iou >= con[:, None]
    any_sat = jnp.any(sat, axis=1)
    first = jnp.argmax(sat, axis=1)  # first satisfying candidate
    identity = jnp.asarray([0.0, 0.0, float(s), float(s)])
    win = jnp.where(
        any_sat[:, None],
        jnp.take_along_axis(cand, first[:, None, None], axis=1)[:, 0],
        identity,
    )  # (N, 4) yxyx window in scene pixels

    # -- render through the separable sampler (mean fill outside) ---------
    wy0, wx0, wy1, wx1 = (win[:, i] for i in range(4))
    theta = box_to_theta(
        jnp.stack([wx0, wy0, wx1, wy1], axis=-1), Size(s, s)
    )
    ones = jnp.ones_like(scenes[..., :1])
    stacked = jnp.concatenate([scenes, ones], axis=-1)
    crop = sample_separable(stacked, theta, Size(out_size, out_size))
    coverage = crop[..., 3:4]
    mean = jnp.asarray(MEAN_FILL, dtype=scenes.dtype) / 255.0
    images = crop[..., :3] + (1.0 - coverage) * mean

    # -- transform boxes ---------------------------------------------------
    # match the renderer's align-corners pixel map (box_to_theta):
    # source wy0 -> output 0, wy0 + (ch-1) -> output out-1
    sy = (out_size - 1) / jnp.maximum(wy1 - wy0 - 1.0, 1e-3)
    sx = (out_size - 1) / jnp.maximum(wx1 - wx0 - 1.0, 1e-3)
    by0 = (boxes[..., 0] - wy0[:, None]) * sy[:, None]
    bx0 = (boxes[..., 1] - wx0[:, None]) * sx[:, None]
    by1 = (boxes[..., 2] - wy0[:, None]) * sy[:, None]
    bx1 = (boxes[..., 3] - wx0[:, None]) * sx[:, None]
    cy = (by0 + by1) / 2
    cx = (bx0 + bx1) / 2
    keep = (
        (cy >= 0) & (cy < out_size) & (cx >= 0) & (cx < out_size)
    )  # chainercv: keep boxes whose center stays inside the crop
    valid_out = valid & keep
    boxes_out = jnp.stack(
        [
            jnp.clip(by0, 0, out_size),
            jnp.clip(bx0, 0, out_size),
            jnp.clip(by1, 0, out_size),
            jnp.clip(bx1, 0, out_size),
        ],
        axis=-1,
    )

    # -- horizontal flip ---------------------------------------------------
    flip = jax.random.bernoulli(k_flip, 0.5, (n, 1, 1, 1))
    images = jnp.where(flip, images[:, :, ::-1, :], images)
    fl = flip[:, 0, 0, :]  # (N, 1)
    boxes_out = jnp.where(
        fl[..., None].astype(bool),
        jnp.stack(
            [
                boxes_out[..., 0],
                out_size - boxes_out[..., 3],
                boxes_out[..., 2],
                out_size - boxes_out[..., 1],
            ],
            axis=-1,
        ),
        boxes_out,
    )
    return images, boxes_out, valid_out


def ssd_pooled_body(model, coder, out_size: int, alpha=1.0, k=3, augment=True):
    """Trainer-shaped SSD step body over a raw scene pool.

    ``batch = {'scenes' (N,S,S,3) uint8/float, 'boxes' (N,R,4) px yxyx,
    'valid' (N,R) bool}``; augmentation + encoding happen inside the
    jitted step, so the HBM pool is scenes + boxes only and every epoch
    sees fresh augmentations (the host path pre-encodes a fixed set).
    """
    from loans_tpu.ops.multibox import multibox_loss
    from loans_tpu.train.steps import to_float01

    default_cychw = jnp.asarray(coder.default_bbox)
    default_yxyx = jnp.asarray(coder.default_yxyx)

    def body(state, unused, batch, rng):
        del unused
        scenes = to_float01(batch["scenes"])
        boxes = batch["boxes"]
        valid = batch["valid"]
        if augment:
            images, boxes, valid = ssd_augment_batch(
                rng, scenes, boxes, valid, out_size
            )
        else:
            images = scenes
        mb_gt_loc, mb_gt_conf = encode_batch(
            default_cychw,
            default_yxyx,
            boxes / out_size,
            valid,
            variance=coder.variance,
            iou_thresh=coder.iou_thresh,
        )

        def loss_fn(params):
            mb_loc, mb_conf = model.apply(
                {"params": params}, images, train=True
            )
            loc_loss, conf_loss = multibox_loss(
                mb_loc, mb_conf, mb_gt_loc, mb_gt_conf, k=k
            )
            return loc_loss * alpha + conf_loss, (loc_loss, conf_loss)

        (loss, (loc_loss, conf_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "loss/loc": loc_loss,
            "loss/conf": conf_loss,
        }
        return state, None, metrics

    return body
