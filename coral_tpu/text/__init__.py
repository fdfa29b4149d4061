"""Text processing: normalisation, Danish numerals, and tokenisers."""

from .normalization import (
    DEFAULT_CONVERSION_DICT,
    FILLER_WORDS_PATTERN,
    clean_transcription,
)
from .numerals import NUMERAL_REGEX, convert_numeral_to_words, convert_numerals_in_text
from .tokenizer import CtcTokenizer, dump_vocabulary

__all__ = [
    "DEFAULT_CONVERSION_DICT",
    "FILLER_WORDS_PATTERN",
    "clean_transcription",
    "NUMERAL_REGEX",
    "convert_numeral_to_words",
    "convert_numerals_in_text",
    "CtcTokenizer",
    "dump_vocabulary",
]
