from .checkpoint import (
    list_checkpoint_steps,
    partial_restore,
    restore_checkpoint,
    save_checkpoint,
)
from .eval import Evaluator
from .learning import build_optimizer, lr_schedule
from .loss import batched_iou, hard_mining_ce
from .train import Trainer, TrainState, make_train_step

__all__ = [
    "Evaluator",
    "Trainer",
    "TrainState",
    "batched_iou",
    "build_optimizer",
    "hard_mining_ce",
    "list_checkpoint_steps",
    "lr_schedule",
    "make_train_step",
    "partial_restore",
    "restore_checkpoint",
    "save_checkpoint",
]
