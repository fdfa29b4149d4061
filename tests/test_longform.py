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
