"""Long-form chunked-inference tests: windowing and overlap merging."""

import numpy as np

from coral_tpu.evaluation.longform import chunk_waveform, merge_token_sequences


def test_chunk_waveform_short_audio_single_window():
    audio = np.zeros(1000, dtype=np.float32)
    windows = chunk_waveform(audio, chunk_length=4000, stride=500)
    assert len(windows) == 1 and windows[0][0] == 0


def test_chunk_waveform_overlaps_cover_everything():
    audio = np.arange(10_000, dtype=np.float32)
    chunk, stride = 4000, 500
    windows = chunk_waveform(audio, chunk, stride)
    step = chunk - 2 * stride
    starts = [s for s, _ in windows]
    assert starts == list(range(0, 10_000, step))[: len(starts)]
    # last window reaches the end of the audio
    last_start, last_win = windows[-1]
    assert last_start + len(last_win) == len(audio)


def test_merge_identical_overlap():
    a = [1, 2, 3, 4, 5, 6]
    b = [4, 5, 6, 7, 8, 9]
    merged = merge_token_sequences([a, b])
    assert merged == [1, 2, 3, 4, 5, 6, 7, 8, 9]


def test_merge_three_sequences():
    a = [10, 11, 12, 13]
    b = [12, 13, 14, 15]
    c = [14, 15, 16]
    assert merge_token_sequences([a, b, c]) == [10, 11, 12, 13, 14, 15, 16]


def test_merge_no_overlap_concatenates():
    a = [1, 2, 3]
    b = [7, 8, 9]
    assert merge_token_sequences([a, b]) == [1, 2, 3, 7, 8, 9]


def test_merge_noisy_overlap():
    # One disagreeing token inside the overlap must not derail the merge.
    a = [1, 2, 3, 4, 99, 6]
    b = [4, 5, 6, 7, 8]
    merged = merge_token_sequences([a, b])
    assert merged[:4] == [1, 2, 3, 4]
    assert merged[-2:] == [7, 8]


def test_merge_matches_hf_tokenizer_merge_randomised():
    """Pin merge_token_sequences to the real transformers implementation
    (``tokenization_whisper._find_longest_common_sequence``, the merge the
    reference reaches via the ASR pipeline's ``_decode_asr``) on randomised
    overlapping streams, including noisy overlaps and ragged window sizes."""
    from transformers.models.whisper.tokenization_whisper import (
        _find_longest_common_sequence,
    )

    rng = np.random.default_rng(42)
    for trial in range(60):
        true = rng.integers(0, 50, size=rng.integers(8, 60)).tolist()
        n_windows = int(rng.integers(2, 5))
        windows = []
        step = max(1, len(true) // n_windows)
        for w in range(n_windows):
            lo = max(0, w * step - int(rng.integers(0, 4)))
            hi = min(len(true), (w + 1) * step + int(rng.integers(0, 6)))
            win = true[lo:hi] or [int(rng.integers(0, 50))]
            # sprinkle recognition noise into some overlaps
            win = [
                int(rng.integers(0, 50)) if rng.random() < 0.1 else t
                for t in win
            ]
            windows.append(win)
        want = list(_find_longest_common_sequence(windows))
        got = merge_token_sequences(windows)
        assert got == want, (trial, windows, got, want)


def test_longform_timestamps_offsets_and_trims():
    """Windows' segments are trimmed to their exclusive region and shifted to
    absolute time (the HF return_timestamps stride merge)."""
    import numpy as np

    from coral_tpu.evaluation.longform import transcribe_longform_timestamps

    SR = 100  # 1 "second" = 100 samples, cheap
    chunk_s, stride_s = 4.0, 1.0
    audio = np.zeros(int(10 * SR), dtype=np.float32)  # 4 windows, step 2 s

    class Tok:
        @staticmethod
        def decode_segments(ids):
            # one segment per window: seconds 1.5..2.5 (midpoint 2.0 inside
            # [1, 3) for interior windows), text = window marker
            marker = int(ids[0])
            return [(1.5, 2.5, f"w{marker}")]

    calls = []

    def generate_ids(batch):
        B = batch["input_values"].shape[0]
        base = len(calls) * B
        calls.append(B)
        return np.arange(base, base + B)[:, None]

    segs = transcribe_longform_timestamps(
        audio, generate_ids, Tok(), chunk_seconds=chunk_s,
        stride_seconds=stride_s, sample_rate=SR, batch_size=8,
    )
    # windows start at 0, 2, 4, 6 (last covers to EOF); every marker segment
    # midpoint (2.0) is inside each window's kept region, so all survive with
    # absolute offsets applied.
    assert [s[2] for s in segs] == ["w0", "w1", "w2", "w3"]
    starts = [s[0] for s in segs]
    assert starts == [1.5, 3.5, 5.5, 7.5]
