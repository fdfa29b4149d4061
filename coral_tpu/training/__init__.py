"""Training: optimizer, sharded train step, checkpointing, and the trainer loop."""

from .checkpoint import Checkpointer, abstract_state_like
from .finetune import finetune
from .model_setup import load_model_setup
from .optimizer import create_optimizer
from .train_state import TrainState

__all__ = [
    "Checkpointer",
    "TrainState",
    "abstract_state_like",
    "create_optimizer",
    "finetune",
    "load_model_setup",
]
