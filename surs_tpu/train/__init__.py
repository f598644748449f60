from .optim import make_optimizer, lr_for_epoch, set_learning_rate
from . import losses
from .step import (TrainState, create_train_state, make_train_step,
                   make_eval_loss_step)
from .checkpoint import CheckpointManager

__all__ = [
    "make_optimizer", "lr_for_epoch", "set_learning_rate", "TrainState",
    "create_train_state", "make_train_step", "make_eval_loss_step",
    "CheckpointManager",
]
