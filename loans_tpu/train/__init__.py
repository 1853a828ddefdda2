"""Training harness: functional state, alternating step, loop,
checkpointing, logging, runtime control."""

from loans_tpu.train.state import (
    TrainState,
    adam_amsgrad,
    create_train_state,
)
from loans_tpu.train.steps import (
    AlternatingConfig,
    alternating_step_body,
    make_eval_step,
    make_pooled_train_step,
    make_supervised_train_step,
    make_train_step,
    mse,
    supervised_step_body,
    to_float01,
)
from loans_tpu.train.checkpoint import (
    list_snapshots,
    load_manifest,
    restore_params,
    restore_state,
    save_manifest,
    save_params,
    save_state,
    snapshot_name,
)
from loans_tpu.train.control import CommandChannel, apply_commands
from loans_tpu.train.logger import MetricsLog
from loans_tpu.train.loop import (
    Hook,
    Trainer,
    multiplicative_lr_decay,
    two_state_lr_shifter,
)

__all__ = [
    "TrainState",
    "adam_amsgrad",
    "create_train_state",
    "AlternatingConfig",
    "alternating_step_body",
    "make_eval_step",
    "make_pooled_train_step",
    "supervised_step_body",
    "make_supervised_train_step",
    "make_train_step",
    "mse",
    "to_float01",
    "list_snapshots",
    "load_manifest",
    "restore_params",
    "restore_state",
    "save_manifest",
    "save_params",
    "save_state",
    "snapshot_name",
    "CommandChannel",
    "apply_commands",
    "MetricsLog",
    "Hook",
    "Trainer",
    "multiplicative_lr_decay",
    "two_state_lr_shifter",
]
