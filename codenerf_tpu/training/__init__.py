from codenerf_tpu.training.schedules import step_halving
from codenerf_tpu.training.state import TrainState, create_train_state
from codenerf_tpu.training.train_step import build_optimizer, build_train_step
from codenerf_tpu.training.trainer import Trainer

__all__ = [
    "step_halving",
    "TrainState",
    "create_train_state",
    "build_optimizer",
    "build_train_step",
    "Trainer",
]
