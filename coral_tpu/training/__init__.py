"""Training: optimizer, sharded train step, checkpointing, and the trainer loop."""

from .optimizer import create_optimizer
from .train_state import TrainState

__all__ = ["create_optimizer", "TrainState"]
