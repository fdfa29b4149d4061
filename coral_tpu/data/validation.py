"""ASR-based dataset QA ("bootstrap validation").

Rebuild of the reference's validation subsystem (reference:
``src/coral/validation.py:24-170``): transcribe every sample with a validation
ASR model, attach per-sample ``asr_prediction`` / ``asr_label`` /
``asr_validation_model`` / ``asr_cer`` / ``asr_wer`` columns, and drop samples
whose CER exceeds ``max_cer``. The HF ``pipeline`` transcription loop is replaced
by the framework's jitted batched predictor.
"""

from __future__ import annotations

import logging
from typing import Callable, Iterable, Iterator

from ..evaluation.metrics import cer, wer
from .processing import filter_example, process_example

logger = logging.getLogger(__package__)


def add_validations(
    examples: Iterable[dict],
    predictor: Callable[[dict], list[str]],
    model_id: str,
    text_column: str = "text",
    audio_column: str = "audio",
    lower_case: bool = True,
    sampling_rate: int = 16_000,
    characters_to_keep: str | None = None,
    batch_size: int = 16,
    max_cer: float = 0.6,
    max_pad_seconds: float = 10.0,
) -> Iterator[dict]:
    """Validate a raw example stream; yields surviving rows with QA columns.

    Args:
        examples: Raw dataset rows (HF audio-dataset shaped).
        predictor: Batched transcriber ``(batch dict) -> list[str]`` over
            fixed-shape ``input_values``/``input_lengths`` host arrays (from
            ``evaluation.evaluate.load_saved_predictor``).
        model_id: Recorded in the ``asr_validation_model`` column.
        max_cer: Samples with per-sample CER >= this are dropped (reference:
            ``validation.py:154-165``).
        max_pad_seconds: Audio padding bound for the fixed-shape batches.

    Yields:
        Original rows + validation columns, excluding high-CER samples.
    """
    from ..evaluation.eval_loop import batch_for_eval

    def processed() -> Iterator[dict]:
        for example in examples:
            # Bounds are the reference's validation bounds (0.25 s - 1 h).
            if not filter_example(
                example,
                audio_column=audio_column,
                text_column=text_column,
                min_seconds_per_example=0.25,
                max_seconds_per_example=60 * 60,
            ):
                continue
            yield process_example(
                example,
                characters_to_keep=characters_to_keep,
                text_column=text_column,
                audio_column=audio_column,
                lower_case=lower_case,
                convert_numerals=False,
                target_sample_rate=sampling_rate,
            )

    kept = 0
    dropped = 0
    for batch, texts in batch_for_eval(
        _with_text_alias(processed(), text_column),
        batch_size=batch_size,
        max_seconds=max_pad_seconds,
        sample_rate=sampling_rate,
    ):
        predictions = predictor(batch)
        for row, prediction in zip(texts, predictions):
            example, label = row
            prediction = prediction.lower().strip()
            sample_cer = cer(predictions=[prediction], labels=[label])
            sample_wer = wer(predictions=[prediction], labels=[label])
            out = dict(example)
            out["asr_prediction"] = prediction
            out["asr_label"] = label
            out["asr_validation_model"] = model_id
            out["asr_cer"] = sample_cer
            out["asr_wer"] = sample_wer
            if sample_cer >= max_cer:
                dropped += 1
                continue
            kept += 1
            yield out
    logger.info(
        f"Validation kept {kept:,} samples, dropped {dropped:,} "
        f"(CER >= {max_cer})."
    )


def _with_text_alias(
    stream: Iterator[dict], text_column: str
) -> Iterator[dict]:
    """Shape rows for ``batch_for_eval``, carrying the original row along."""
    for example in stream:
        yield {
            "audio_array": example["audio_array"],
            "text": (example, example.get(text_column, "")),
        }
