"""The alternating localizer/assessor update as one jitted step.

Re-design of ``sheep/sheep_updater.py`` (``SheepAssessor.update_core``).
The reference's GAN-style dance — ``disable_update`` on the assessor,
backward the localizer loss *through* the assessor, ``unchain_backward``
the crops, then backward the assessor loss (``sheep_updater.py:48-66``) —
becomes two ``jax.value_and_grad`` calls over disjoint parameter pytrees:

  * localizer step: grads of MSE(assessor(crops), target) + regularizers
    w.r.t. *localizer params only* (the assessor's params are closed over
    as constants, so gradients flow through it but never update it);
  * assessor step: grads of MSE(assessor(real), iou_labels) w.r.t.
    assessor params. The reference evaluates this forward with pre-update
    assessor params (:35) — identical here since the localizer step never
    touches them. Skipped (but still reported) when the assessor is
    frozen (``--rd`` resume, ``sheep_updater.py:16,62-66``).

Everything fuses into a single XLA program: 2 assessor forwards, 1
localizer forward, 2 backwards, 2 optimizer updates per iteration, with
the batch sharded over the ``data`` mesh axis (gradient all-reduce is
inserted by the SPMD partitioner).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from loans_tpu.ops.geometry import Size, theta_corners
from loans_tpu.ops.losses import direction_loss, out_of_image_loss
from loans_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class AlternatingConfig:
    """Static configuration of the alternating update."""

    localizer_target: float = 1.0  # sheep_updater.py:17
    freeze_assessor: bool = False  # "freeze_discriminator", :16
    image_size: Size = Size(224, 224)
    # On-device flip/photometric jitter of the assessor's labeled crops
    # (data/device_augment.py) — breaks pool memorization on the
    # device-resident training path.
    augment_reference: bool = False
    # EMA decay for the assessor params used to SCORE the localizer
    # (0 = score with the live params, the reference behavior,
    # sheep_updater.py:40-74). The assessor still trains on its live
    # params; only the localizer's scoring surface is smoothed —
    # ~1/(1-decay) steps of memory damp the jump when the reference
    # pool is refreshed (--assessor-refresh).
    assessor_ema: float = 0.0
    # Iteration at which the EMA starts accumulating. Before this step
    # the shadow params are held exactly equal to the live params
    # (decay forced to 0), so scoring through ``ema_params`` is
    # identical to live-params scoring — i.e. reference behavior until
    # switch-on. Motivated by the round-5 seed-1/2 EMA runs: smoothing
    # the scoring surface BEFORE localizer takeoff starves the early
    # localizer/assessor co-calibration, while smoothing after takeoff
    # is where the refresh-shock damping pays.
    assessor_ema_start: int = 0


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def to_float01(x: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1]; float passes through.

    Batches travel host->device as uint8 (4x less interconnect/PCIe
    traffic than float32); normalization fuses into the first conv.
    """
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * (1.0 / 255.0)
    return x


def make_train_step(localizer, assessor, config: AlternatingConfig):
    """Build the jitted alternating train step.

    Returns a function
      ``(loc_state, ass_state, batch, rng) -> (loc_state, ass_state, metrics)``
    where ``batch = {'real': (N,h,w,c), 'labels': (N,1), 'unlabeled':
    (N,H,W,3)}``. Donates both states.
    """
    return jax.jit(
        alternating_step_body(localizer, assessor, config),
        donate_argnums=(0, 1),
    )


def alternating_step_body(localizer, assessor, config: AlternatingConfig):
    """The unjitted alternating update (shared by the single-step and
    scanned/pooled step builders)."""

    def train_step(
        loc_state: TrainState,
        ass_state: TrainState,
        batch: dict[str, Any],
        rng: jax.Array,
    ):
        real_images = to_float01(batch["real"])
        labels = batch["labels"]
        unlabeled = to_float01(batch["unlabeled"])
        if config.augment_reference:
            from loans_tpu.data.device_augment import augment_crops

            rng, aug_rng = jax.random.split(rng)
            real_images = augment_crops(aug_rng, real_images)

        def loc_loss_fn(loc_params):
            rngs = {"rotation_dropout": rng}
            (rois, theta), updates = localizer.apply(
                {
                    "params": loc_params,
                    "batch_stats": loc_state.batch_stats,
                },
                unlabeled,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            score_params = (
                ass_state.ema_params
                if config.assessor_ema > 0
                else ass_state.params
            )
            y_fake = assessor.apply({"params": score_params}, rois)
            target = jnp.full_like(y_fake, config.localizer_target)
            loss = mse(y_fake, target)
            corners = theta_corners(theta)
            loss = loss + direction_loss(corners, config.image_size)
            loss = loss + out_of_image_loss(corners)
            return loss, (updates["batch_stats"], y_fake, theta)

        (loss_localizer, (new_bn, y_fake, theta)), loc_grads = (
            jax.value_and_grad(loc_loss_fn, has_aux=True)(loc_state.params)
        )
        loc_state = loc_state.apply_gradients(
            loc_grads, new_batch_stats=new_bn
        )

        def ass_loss_fn(ass_params):
            y_real = assessor.apply({"params": ass_params}, real_images)
            return mse(y_real, labels), y_real

        (loss_dis, y_real), ass_grads = jax.value_and_grad(
            ass_loss_fn, has_aux=True
        )(ass_state.params)
        if not config.freeze_assessor:
            ass_state = ass_state.apply_gradients(ass_grads)
            if config.assessor_ema > 0:
                d = config.assessor_ema
                if config.assessor_ema_start > 0:
                    # Traced select, scan/jit-safe: decay 0 pins the
                    # shadow to the live params until switch-on.
                    d = jnp.where(
                        ass_state.step >= config.assessor_ema_start,
                        d,
                        0.0,
                    )
                ass_state = ass_state.replace(
                    ema_params=jax.tree.map(
                        # astype: keep the carry dtype invariant (a
                        # traced f32 decay would otherwise promote
                        # low-precision leaves inside lax.scan).
                        lambda e, p: (d * e + (1.0 - d) * p).astype(
                            e.dtype
                        ),
                        ass_state.ema_params,
                        ass_state.params,
                    )
                )

        metrics = {
            "loss_localizer": loss_localizer,
            "loss_dis": loss_dis,
            "y_fake_mean": jnp.mean(y_fake),
            "y_real_mean": jnp.mean(y_real),
        }
        return loc_state, ass_state, metrics

    return train_step


def make_pooled_train_step(body, steps_per_call: int):
    """Scan ``steps_per_call`` train iterations inside ONE dispatch,
    gathering every batch on-device from an HBM-resident dataset pool.

    Round-1 profiling showed ~15% of wall time per step was host
    dispatch through the device tunnel, and every step shipped a full
    image batch host->device (``sheep_updater.py:32-38`` equivalent
    copies). With the dataset resident in HBM (``data/device_data``)
    the whole inner loop runs device-side: one jitted call executes K
    steps, each gathering its batch by index with ``jnp.take``. Host
    traffic per K steps = one (K, B) int32 index array.

    Args:
      body: unjitted ``(loc_state, ass_state, batch, rng) -> (loc_state,
        ass_state, metrics)`` (``alternating_step_body`` or the
        supervised equivalent; ``ass_state`` may be None).
      steps_per_call: K, the scan length.

    Returns a jitted ``(loc_state, ass_state, chunk, rng)`` where
    ``chunk = {'pools': {group: pytree_of_(N,...)_arrays}, 'idx':
    {group: (K, B) int32}}``; per-iteration batches are the union of the
    per-group gathered pytrees (dicts merge; a single non-dict group
    passes through). Metrics are averaged over the K steps.
    """

    def gather(tree, ind):
        return jax.tree_util.tree_map(
            lambda a: jnp.take(a, ind, axis=0), tree
        )

    def pooled_step(loc_state, ass_state, chunk, rng):
        pools, idx = chunk["pools"], chunk["idx"]
        rngs = jax.random.split(rng, steps_per_call)

        def scan_fn(carry, per_step):
            loc, ass = carry
            step_idx, step_rng = per_step
            parts = [
                gather(pools[g], step_idx[g]) for g in sorted(pools)
            ]
            if len(parts) == 1:
                batch = parts[0]
            else:
                batch = {}
                for p in parts:
                    batch.update(p)
            loc, ass, metrics = body(loc, ass, batch, step_rng)
            return (loc, ass), metrics

        (loc_state, ass_state), metrics = jax.lax.scan(
            scan_fn, (loc_state, ass_state), (idx, rngs)
        )
        metrics = jax.tree_util.tree_map(
            lambda m: jnp.mean(m, axis=0), metrics
        )
        return loc_state, ass_state, metrics

    return jax.jit(pooled_step, donate_argnums=(0, 1))


def make_eval_step(localizer, image_size: Size):
    """Eval-mode forward: images -> (theta, corners, boxes).

    The metric computation itself (IoU, VOC mAP) lives in
    ``loans_tpu/eval``; this step returns device arrays only.
    """

    @partial(jax.jit)
    def eval_step(loc_state: TrainState, images):
        images = to_float01(images)
        _, theta = localizer.apply(
            {
                "params": loc_state.params,
                "batch_stats": loc_state.batch_stats,
            },
            images,
            train=False,
        )
        return theta

    return eval_step


def make_supervised_train_step(localizer, config: AlternatingConfig):
    """Supervised localizer training: regress gt boxes directly.

    The reference ships the machinery for this unwired
    (``TransformParameterRegressionLossCalculator``,
    ``common/utils.py:242-298``; IoU calculators :21-134); this step is
    the working version: Huber loss on the predicted aabb corners plus a
    smooth-IoU term, with the usual direction/out-of-image regularizers.

    ``batch = (images (N,H,W,C), gt_boxes (N,1,4) yxyx pixels, ...)``.
    Trainer-shaped: ``(state, None, batch, rng) -> (state, None, metrics)``.
    """
    return jax.jit(
        supervised_step_body(localizer, config), donate_argnums=(0,)
    )


def supervised_step_body(localizer, config: AlternatingConfig):
    """Unjitted supervised update (see ``make_supervised_train_step``)."""
    from loans_tpu.ops.geometry import corners_to_aabb
    from loans_tpu.ops.losses import huber_loss, smooth_iou_loss

    def train_step(state: TrainState, unused, batch, rng):
        del unused
        images = to_float01(batch[0])
        gt = batch[1].reshape(images.shape[0], -1)[:, :4]

        def loss_fn(params):
            rngs = {"rotation_dropout": rng}
            (_, theta), updates = localizer.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            corners = theta_corners(theta)
            boxes = corners_to_aabb(corners, config.image_size, clip=False)
            scale = float(
                max(config.image_size.height, config.image_size.width)
            )
            reg = jnp.mean(huber_loss(boxes / scale, gt / scale))
            iou = smooth_iou_loss(boxes, gt)
            loss = reg + 0.5 * iou
            loss = loss + direction_loss(corners, config.image_size)
            loss = loss + out_of_image_loss(corners)
            return loss, (updates["batch_stats"], reg, iou)

        (loss, (new_bn, reg, iou)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads, new_batch_stats=new_bn)
        metrics = {
            "loss_localizer": loss,
            "loss/box": reg,
            "loss/iou": iou,
        }
        return state, None, metrics

    return train_step
