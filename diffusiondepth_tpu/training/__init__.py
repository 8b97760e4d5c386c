from .optim import make_lr_schedule, make_optimizer
from .train_state import TrainState, create_train_state
from .steps import make_eval_step, make_train_step

__all__ = [
    "make_lr_schedule",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
