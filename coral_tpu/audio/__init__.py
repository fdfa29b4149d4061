"""Audio: device-side feature extraction, augmentation, and host-side resampling."""

from .features import znorm
from .resample import resample

__all__ = ["znorm", "resample"]
