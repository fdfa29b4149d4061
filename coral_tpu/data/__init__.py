"""Data pipeline: sources, interleaving, processing, batching, device prefetch."""

from .batching import BucketBatcher, prefetch_to_device
from .interleave import interleave_iterables
from .processing import filter_example, process_example

__all__ = [
    "BucketBatcher",
    "prefetch_to_device",
    "interleave_iterables",
    "filter_example",
    "process_example",
]
