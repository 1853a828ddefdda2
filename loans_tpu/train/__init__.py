"""Training harness: functional state, alternating step, schedules."""

from loans_tpu.train.state import (
    TrainState,
    adam_amsgrad,
    create_train_state,
)
from loans_tpu.train.steps import (
    AlternatingConfig,
    make_eval_step,
    make_train_step,
    mse,
)

__all__ = [
    "TrainState",
    "adam_amsgrad",
    "create_train_state",
    "AlternatingConfig",
    "make_eval_step",
    "make_train_step",
    "mse",
]
