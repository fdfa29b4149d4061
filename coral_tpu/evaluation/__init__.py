"""Evaluation: error-rate metrics, decoding, and the evaluation pipeline."""

from .metrics import cer, wer, levenshtein_counts

__all__ = ["cer", "wer", "levenshtein_counts"]
