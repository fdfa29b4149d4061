"""High-level ASR pipeline: one object from model id to transcripts.

The reference's user-facing inference surface is the HF ASR ``pipeline``
(reference: ``src/coral/evaluate.py:123-158``, ``run_asr_demo.py:43-48``). This
is the coral-tpu equivalent: load a saved model (or a locally-cached pretrained
checkpoint), and transcribe waveforms, files, or batches — with beam-search +
n-gram fusion when a decoder is stored next to a wav2vec2 model, and chunked
long-form handling for audio beyond the model window.

    from coral_tpu.pipeline import ASRPipeline
    asr = ASRPipeline("models/roest-315m")
    print(asr("recording.wav"))
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np

logger = logging.getLogger(__package__)


class ASRPipeline:
    """Batched transcriber over a saved coral-tpu model.

    Args:
        model_id: A coral-tpu model directory (``config.yaml`` + ``model/``) or
            a pretrained HF checkpoint id/path resolvable locally.
        batch_size: Device batch size for transcription.
        no_lm: Disable beam-search + n-gram fusion even when a decoder exists
            (reference: the ``no_lm`` switch, ``evaluate.py:142-151``).
        sampling_rate: Input audio is resampled to this rate.
    """

    def __init__(
        self,
        model_id: str | Path,
        batch_size: int = 8,
        no_lm: bool = False,
        sampling_rate: int = 16_000,
        cache_dir: str | None = None,
    ) -> None:
        from .config import DictConfig
        from .evaluation.evaluate import load_saved_predictor

        self.sampling_rate = sampling_rate
        self.batch_size = batch_size
        config = DictConfig(
            {
                "model_id": str(model_id),
                "batch_size": batch_size,
                "no_lm": no_lm,
                "sampling_rate": sampling_rate,
                "lower_case": True,
                "characters_to_keep":
                    "abcdefghijklmnopqrstuvwxyzæøå0123456789éü",
                "max_seconds_per_example": 30,
                "cache_dir": cache_dir,
            }
        )
        self._predict, geometry = load_saved_predictor(config)
        self.window_seconds = float(geometry["max_seconds"])

    # -- input handling ---------------------------------------------------------
    def _load_audio(self, item) -> np.ndarray:
        if isinstance(item, (str, Path)):
            from .audio.noise_bank import _read_wav

            audio = _read_wav(Path(item), self.sampling_rate)
            if audio is None:
                raise ValueError(f"Could not decode audio file: {item}")
            return audio
        if isinstance(item, dict):  # HF-style {"array", "sampling_rate"}
            audio = np.asarray(item["array"], dtype=np.float32)
            if int(item.get("sampling_rate", self.sampling_rate)) != (
                self.sampling_rate
            ):
                from .audio.resample import resample

                audio = resample(
                    audio, int(item["sampling_rate"]), self.sampling_rate
                )
            return audio
        return np.asarray(item, dtype=np.float32)

    # -- transcription -----------------------------------------------------------
    def transcribe_batch(self, items: Sequence) -> list[str]:
        """Transcribe a sequence of short clips (padded to the model window)."""
        T = int(self.window_seconds * self.sampling_rate)
        out: list[str] = []
        audios = [self._load_audio(item) for item in items]
        for start in range(0, len(audios), self.batch_size):
            group = audios[start : start + self.batch_size]
            batch_audio = np.zeros((self.batch_size, T), dtype=np.float32)
            lengths = np.ones((self.batch_size,), dtype=np.int32)
            for j, audio in enumerate(group):
                clip = audio[:T]
                batch_audio[j, : len(clip)] = clip
                lengths[j] = max(1, len(clip))
            predictions = self._predict(
                {"input_values": batch_audio, "input_lengths": lengths}
            )
            out.extend(predictions[: len(group)])
        return out

    def transcribe(self, item) -> str:
        """Transcribe one input (path / array / HF audio dict), any length."""
        audio = self._load_audio(item)
        T = int(self.window_seconds * self.sampling_rate)
        if len(audio) <= T:
            return self.transcribe_batch([audio])[0]
        from .evaluation.longform import chunk_waveform

        stride = T // 6
        windows = [w for _, w in chunk_waveform(audio, T, stride)]
        pieces = self.transcribe_batch(windows)
        return " ".join(piece for piece in pieces if piece).strip()

    __call__ = transcribe

    def transcribe_stream(self, items: Iterable) -> Iterable[str]:
        """Lazily transcribe an iterable of inputs."""
        buffer: list = []
        for item in items:
            buffer.append(item)
            if len(buffer) == self.batch_size:
                yield from self.transcribe_batch(buffer)
                buffer = []
        if buffer:
            yield from self.transcribe_batch(buffer)
