from vfmseg_tpu.train.optim import (
    make_optimizer,
    partition_params,
    merge_params,
    poly_schedule,
    trainable_predicate,
)
from vfmseg_tpu.train.state import TrainState
from vfmseg_tpu.train.step import make_train_step

__all__ = [
    "make_optimizer",
    "partition_params",
    "merge_params",
    "poly_schedule",
    "trainable_predicate",
    "TrainState",
    "make_train_step",
]
