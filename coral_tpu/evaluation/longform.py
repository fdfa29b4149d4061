"""Long-form transcription: chunked Whisper inference with overlap merging.

The reference relies on the HF ASR pipeline's chunking for audio longer than the
model window (reference: ``src/coral/evaluate.py:56-60``, pipeline
``chunk_length_s``): the waveform is split into overlapping windows, each window
is transcribed independently, and the token sequences are merged by maximising
agreement in the overlap. Here the windows are batched into ONE generate call so
the device sees a single large batch instead of a Python loop.
"""

from __future__ import annotations

import logging
from typing import Callable, Sequence

import numpy as np

logger = logging.getLogger(__package__)


def chunk_waveform(
    audio: np.ndarray, chunk_length: int, stride: int
) -> list[tuple[int, np.ndarray]]:
    """Split a 1-D waveform into overlapping windows.

    Args:
        audio: (T,) waveform.
        chunk_length: Window size in samples (e.g. 30 s).
        stride: Overlap on each side, in samples (HF default: chunk / 6).

    Returns:
        List of (start_offset, window) pairs; the last window may be short.
    """
    if len(audio) <= chunk_length:
        return [(0, audio)]
    step = chunk_length - 2 * stride
    assert step > 0, "stride too large for the chunk length"
    out = []
    start = 0
    while start < len(audio):
        out.append((start, audio[start : start + chunk_length]))
        if start + chunk_length >= len(audio):
            break
        start += step
    return out


def merge_token_sequences(
    sequences: Sequence[Sequence[int]],
) -> list[int]:
    """Merge overlapping token sequences (HF's longest-common-sequence merge).

    Semantics match ``transformers``' whisper tokenizer
    ``_find_longest_common_sequence`` exactly (the merge the reference hits
    through the ASR pipeline's ``_decode_asr``): each new window slides across
    the *remainder* of the previous one over every alignment (including
    windows shorter or longer than the remainder), alignments are scored by
    match density plus an ``i / 10000`` bonus that favours long perfect
    matches, and the winning overlap is split down the middle — the left
    window keeps the first half, the right window supplies the rest.
    Pinned against the real library in ``tests/test_longform.py``.
    """
    if not sequences:
        return []
    left = list(sequences[0])
    total: list[int] = []
    for right in sequences[1:]:
        right = list(right)
        nl, nr = len(left), len(right)
        best = 0.0
        cut = (nl, nl, 0, 0)
        for i in range(1, nl + nr):
            ls, lstop = max(0, nl - i), min(nl, nl + nr - i)
            rs, rstop = max(0, i - nl), min(nr, i)
            matches = sum(
                a == b for a, b in zip(left[ls:lstop], right[rs:rstop])
            )
            score = matches / i + i / 10000.0
            if matches > 1 and score > best:
                best = score
                cut = (ls, lstop, rs, rstop)
        ls, lstop, rs, rstop = cut
        total.extend(left[: (ls + lstop) // 2])
        left = right[(rs + rstop) // 2:]
    total.extend(left)
    return total


def transcribe_longform(
    audio: np.ndarray,
    generate_ids: Callable[[dict], np.ndarray],
    tokenizer,
    chunk_seconds: float = 30.0,
    stride_seconds: float = 5.0,
    sample_rate: int = 16_000,
    batch_size: int = 8,
) -> str:
    """Transcribe arbitrarily long audio with one batched generate call per
    ``batch_size`` windows.

    Args:
        audio: (T,) waveform at ``sample_rate``.
        generate_ids: Jitted ``(batch dict) -> (B, L) token ids`` (from
            ``make_whisper_generate_step``), padded batches of fixed shape.
        tokenizer: Whisper tokenizer for stripping specials + decoding.

    Returns:
        The merged transcript.
    """
    chunk_length = int(chunk_seconds * sample_rate)
    stride = int(stride_seconds * sample_rate)
    windows = chunk_waveform(np.asarray(audio, dtype=np.float32), chunk_length,
                             stride)

    id_sequences: list[list[int]] = []
    for i in range(0, len(windows), batch_size):
        group = windows[i : i + batch_size]
        batch_audio = np.zeros((batch_size, chunk_length), dtype=np.float32)
        lengths = np.ones((batch_size,), dtype=np.int32)
        for j, (_, w) in enumerate(group):
            batch_audio[j, : len(w)] = w
            lengths[j] = len(w)
        ids = np.asarray(
            generate_ids({"input_values": batch_audio, "input_lengths": lengths})
        )
        for j in range(len(group)):
            seq = [
                int(t) for t in ids[j]
                if int(t) < tokenizer.first_special_id
            ]
            id_sequences.append(seq)

    if stride == 0:
        # No overlap to reconcile: the HF pipeline only runs its
        # longest-common-sequence merge on stride overlaps; with none, the
        # heuristic would hallucinate weak matches between unrelated
        # neighbouring windows and swallow tokens.
        merged = [t for seq in id_sequences for t in seq]
    else:
        merged = merge_token_sequences(id_sequences)
    return tokenizer.bpe.decode(merged).strip()


def transcribe_longform_timestamps(
    audio: np.ndarray,
    generate_ids: Callable[[dict], np.ndarray],
    tokenizer,
    chunk_seconds: float = 30.0,
    stride_seconds: float = 5.0,
    sample_rate: int = 16_000,
    batch_size: int = 8,
) -> list[tuple[float, float, str]]:
    """Timestamped long-form transcription.

    ``generate_ids`` must run the timestamp grammar (``return_timestamps`` /
    ``make_whisper_generate_step(timestamps=True)``); each window's segments
    are cut out of the overlap by time — a segment survives when its midpoint
    falls inside the window's exclusive region (the HF pipeline's
    stride-trimming for ``return_timestamps``, reference surface:
    ``src/coral/evaluate.py:47-74``) — then shifted by the window offset.

    Returns:
        Absolute-time (start_seconds, end_seconds, text) tuples.
    """
    chunk_length = int(chunk_seconds * sample_rate)
    stride = int(stride_seconds * sample_rate)
    windows = chunk_waveform(np.asarray(audio, dtype=np.float32), chunk_length,
                             stride)

    out: list[tuple[float, float, str]] = []
    for i in range(0, len(windows), batch_size):
        group = windows[i : i + batch_size]
        batch_audio = np.zeros((batch_size, chunk_length), dtype=np.float32)
        lengths = np.ones((batch_size,), dtype=np.int32)
        for j, (_, w) in enumerate(group):
            batch_audio[j, : len(w)] = w
            lengths[j] = len(w)
        ids = np.asarray(
            generate_ids({"input_values": batch_audio, "input_lengths": lengths})
        )
        for j, (start_sample, w) in enumerate(group):
            window_index = i + j
            is_first = window_index == 0
            is_last = window_index == len(windows) - 1
            lo = 0.0 if is_first else stride_seconds
            hi = chunk_seconds if is_last else chunk_seconds - stride_seconds
            offset = start_sample / sample_rate
            for seg_start, seg_end, text in tokenizer.decode_segments(ids[j]):
                mid = (seg_start + seg_end) / 2.0
                if lo <= mid < hi:
                    out.append((seg_start + offset, seg_end + offset, text))
    return out
