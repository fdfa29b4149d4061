"""On-device ops: CTC loss, audio frontend, SpecAugment, and augmentation kernels."""

from .ctc import ctc_loss

__all__ = ["ctc_loss"]
