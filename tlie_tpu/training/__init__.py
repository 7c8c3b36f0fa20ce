from .state import (
    create_train_state,
    create_train_state_s5,
    create_train_state_adamw,
    set_group_learning_rates,
)
from .schedules import (
    constant_lr,
    cosine_annealing,
    linear_warmup,
    reduce_lr_on_plateau,
)
from .steps import eval_step, prep_batch, train_step, cross_entropy_loss
from .loop import train
from .checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "create_train_state",
    "create_train_state_s5",
    "create_train_state_adamw",
    "set_group_learning_rates",
    "constant_lr",
    "cosine_annealing",
    "linear_warmup",
    "reduce_lr_on_plateau",
    "eval_step",
    "prep_batch",
    "train_step",
    "cross_entropy_loss",
    "train",
    "save_checkpoint",
    "restore_checkpoint",
]
