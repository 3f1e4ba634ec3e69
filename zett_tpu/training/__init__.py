"""Training engine: state, losses, schedules, optimizer, Trainer."""

from .config import TrainingConfig
from .engine import Trainer
from .losses import lexical_loss, lm_loss
from .optimizer import build_optimizer, decay_mask_fn, get_labels
from .schedules import create_learning_rate_fn
from .state import TrainState

__all__ = [
    "TrainState",
    "Trainer",
    "TrainingConfig",
    "build_optimizer",
    "create_learning_rate_fn",
    "decay_mask_fn",
    "get_labels",
    "lexical_loss",
    "lm_loss",
]
