"""Training: optax optimizers/schedules, jit'd train/eval steps, trainers,
early stopping, checkpointing — the re-design of fragnet/train/*."""

from fragnet_tpu.train.optim import make_optimizer, make_schedule
from fragnet_tpu.train.loop import TrainerFineTune, TrainState
from fragnet_tpu.train.earlystop import EarlyStopping
from fragnet_tpu.train.checkpoint import load_params, save_params

__all__ = [
    "make_optimizer",
    "make_schedule",
    "TrainerFineTune",
    "TrainState",
    "EarlyStopping",
    "load_params",
    "save_params",
]
