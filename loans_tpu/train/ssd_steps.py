"""Supervised SSD train step + optimizer.

Parity with ``schaaaafrichter/train.py``: ``MultiboxTrainChain``
(:34-53, loss = loc + conf via ``multibox_loss`` with k=3) and the
optimizer hooks (:174-180, Adam with ``GradientScaling(2)`` on biases
and ``WeightDecay(5e-4)`` on everything else). One jitted step; the
multi-GPU ``MultiprocessParallelUpdater`` (:189-191) becomes the same
program with the batch sharded over the data mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from loans_tpu.ops.multibox import multibox_loss
from loans_tpu.train.state import TrainState


def _bias_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: path[-1].key == "bias", params
    )


def ssd_optimizer(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    """Adam + 2x bias gradients + 5e-4 weight decay on non-bias params."""

    def tx(learning_rate):
        return optax.chain(
            optax.masked(
                optax.scale(2.0), lambda p: _bias_mask(p)
            ),
            optax.add_decayed_weights(
                5e-4, mask=lambda p: jax.tree_util.tree_map(
                    lambda m: not m, _bias_mask(p)
                )
            ),
            optax.adam(learning_rate),
        )

    return optax.inject_hyperparams(tx)(learning_rate=learning_rate)


def make_ssd_train_step(model, alpha: float = 1.0, k: int = 3):
    """(state, None, batch, rng) -> (state, None, metrics); Trainer-shaped.

    ``batch = (images (N,S,S,3), mb_loc (N,K,4), mb_conf (N,K))``.
    """

    def train_step(state: TrainState, unused, batch, rng):
        del unused, rng
        images, gt_loc, gt_conf = batch

        def loss_fn(params):
            mb_loc, mb_conf = model.apply(
                {"params": params}, images, train=True
            )
            loc_loss, conf_loss = multibox_loss(
                mb_loc, mb_conf, gt_loc, gt_conf, k=k
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

    return jax.jit(train_step, donate_argnums=(0,))


def make_ssd_predict_step(model, coder, score_thresh: float = 0.6):
    """Batched device decode: images -> (boxes yxyx [0,1], scores).

    NMS runs host-side afterwards (ragged); this returns per-anchor
    decoded boxes and foreground scores.
    """

    @jax.jit
    def predict(state: TrainState, images):
        mb_loc, mb_conf = model.apply(
            {"params": state.params}, images, train=False
        )
        boxes = coder.decode_batch(mb_loc)
        probs = jax.nn.softmax(mb_conf, axis=-1)
        return boxes, probs

    del score_thresh
    return predict
