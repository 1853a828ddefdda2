"""Functional train state: params + BN stats + optimizer state as pytrees.

Replaces chainer's Link/Optimizer mutable objects and the npz snapshot
contract. The learning rate is wired through ``optax.inject_hyperparams``
so it lives *inside* the optimizer state, giving runtime LR control
(the reference's interactive ``shiftlr`` REPL command,
``commands/interactive_train.py:21-32``, and its LR-shift extensions,
``train_utils/train_utils.py:17-82``) without recompilation.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Model + optimizer state for one network."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Optional EMA of ``params`` (None = disabled). Used by the
    # alternating update to score the localizer against a smoothed
    # assessor (``--assessor-ema``): damps the refresh-shock scoring
    # jumps measured in the round-4 hard-weak runs. Not persisted in
    # snapshots — re-synced to ``params`` on resume.
    ema_params: Any = None

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                self.batch_stats
                if new_batch_stats is None
                else new_batch_stats
            ),
            opt_state=new_opt_state,
        )

    def with_ema(self):
        """Return a state whose ``ema_params`` is a fresh COPY of
        ``params``. A copy, not an alias: the train steps donate their
        state arguments, and donating the same buffer twice is an XLA
        error."""
        return self.replace(
            ema_params=jax.tree_util.tree_map(
                jax.numpy.array, self.params
            )
        )

    @property
    def learning_rate(self):
        """Current LR (requires an inject_hyperparams optimizer)."""
        return self.opt_state.hyperparams["learning_rate"]

    def with_learning_rate(self, lr):
        """Return a state with the LR replaced (no recompilation)."""
        hyper = dict(self.opt_state.hyperparams)
        hyper["learning_rate"] = jax.numpy.asarray(
            lr, dtype=jax.numpy.float32
        )
        return self.replace(
            opt_state=self.opt_state._replace(hyperparams=hyper)
        )


def adam_amsgrad(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    """Adam(amsgrad), chainer defaults (``train_sheep_localizer.py:130-136``:
    alpha=1e-3, beta1=0.9, beta2=0.999, eps=1e-8), LR runtime-adjustable."""
    return optax.inject_hyperparams(optax.amsgrad)(
        learning_rate=learning_rate
    )


def create_train_state(
    model,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    **init_kwargs,
) -> TrainState:
    """Initialize a TrainState from a flax module."""
    variables = model.init(rng, sample_input, **init_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jax.numpy.zeros((), dtype=jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
