"""Log-mel frontend parity with the reference's Whisper feature extraction.

The reference extracts features through ``WhisperProcessor`` on CPU workers
(reference: ``src/coral/data.py:747-751``); ours is an on-device XLA kernel.
Parity is asserted against ``transformers.WhisperFeatureExtractor``, which is
constructible offline and implements the same transform in numpy.
"""

import numpy as np
import pytest

from coral_tpu.audio.mel import log_mel_spectrogram, mel_filterbank


@pytest.mark.parametrize("n_mels", [80, 128])
def test_log_mel_matches_whisper_feature_extractor(n_mels):
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=n_mels)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16_000 * 3) * 0.1).astype(np.float32)
    ref = fe(audio, sampling_rate=16_000, return_tensors="np").input_features[0]

    padded = np.zeros((1, 480_000), dtype=np.float32)
    padded[0, : len(audio)] = audio
    ours = np.asarray(log_mel_spectrogram(padded, n_mels=n_mels))[0].T

    assert ours.shape == ref.shape == (n_mels, 3000)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_mel_filterbank_shape_and_normalisation():
    fb = mel_filterbank(n_mels=80)
    assert fb.shape == (201, 80)
    assert (fb >= 0).all()
    # Slaney normalisation keeps filter areas of the same order.
    sums = fb.sum(axis=0)
    assert (sums > 0).all()


def test_short_chunk_compiles():
    # Fine-tuning may use shorter windows; any hop-multiple length works.
    audio = np.zeros((2, 16_000), dtype=np.float32)
    out = np.asarray(log_mel_spectrogram(audio))
    assert out.shape == (2, 100, 80)
