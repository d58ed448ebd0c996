from .checkpoints import CheckpointManager
from .optim import build_optimizer, learning_rate_schedule
from .trainer import TrainState, Trainer, make_eval_step, make_train_step

__all__ = [
    "CheckpointManager", "build_optimizer", "learning_rate_schedule",
    "TrainState", "Trainer", "make_eval_step", "make_train_step",
]
