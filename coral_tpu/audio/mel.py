"""Whisper log-mel spectrogram frontend, computed on device.

The reference extracts log-mel features on CPU dataloader workers through
``WhisperProcessor`` (reference: ``src/coral/data.py:747-751``); the underlying
transform is OpenAI Whisper's: 400-point Hann STFT with hop 160 (center-padded),
power spectrum, slaney-normalised mel filterbank (80 bins; 128 for large-v3),
``log10`` with a dynamic-range floor of 8 dB below the max, then ``(x + 4) / 4``.

TPU-first design: framing is a strided patch extraction and the DFT is two real
matmuls against fixed cos/sin matrices — both land on the MXU and fuse with the
mel projection, so the whole frontend is a handful of matmuls fused into the
encoder's first conv. The mel filterbank and DFT basis are host-precomputed
constants baked into the compiled program.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SECONDS = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_SECONDS  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3_000


def mel_filterbank(
    n_mels: int = 80, n_fft: int = N_FFT, sample_rate: int = SAMPLE_RATE
) -> np.ndarray:
    """Slaney-style mel filterbank, matching ``librosa.filters.mel`` defaults.

    Returns:
        (n_freqs, n_mels) float32 projection matrix, n_freqs = n_fft // 2 + 1.
    """

    def hz_to_mel(f: np.ndarray | float) -> np.ndarray:
        f = np.asarray(f, dtype=np.float64)
        # Slaney scale: linear below 1 kHz, logarithmic above.
        mel = f / (200.0 / 3)
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        with np.errstate(divide="ignore"):  # f=0 branch is discarded by the where
            return np.where(
                f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel
            )

    def mel_to_hz(m: np.ndarray) -> np.ndarray:
        m = np.asarray(m, dtype=np.float64)
        min_log_mel = 1000.0 / (200.0 / 3)
        logstep = np.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel,
            1000.0 * np.exp(logstep * (m - min_log_mel)),
            m * (200.0 / 3),
        )

    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sample_rate / 2), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalisation: each filter integrates to ~1.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


@lru_cache(maxsize=4)
def _dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases, Hann-windowed: two (n_fft, n_freqs) matrices."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    window = np.hanning(n_fft + 1)[:-1][:, None]  # periodic Hann (torch.hann_window)
    return (
        (np.cos(angle) * window).astype(np.float32),
        (np.sin(angle) * window).astype(np.float32),
    )


def frame_signal(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, n_fft) centered frames with reflect padding."""
    pad = n_fft // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    # Strided patch extraction; lowers to a cheap gather/reshape in XLA.
    patches = jax.lax.conv_general_dilated_patches(
        audio[:, None, :],  # (B, C=1, T)
        filter_shape=(n_fft,),
        window_strides=(hop,),
        padding="VALID",
    )  # (B, n_fft, n_frames)
    return jnp.transpose(patches, (0, 2, 1))


def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Whisper-compatible log-mel features.

    Args:
        audio: (B, T) float waveforms at 16 kHz, already padded/trimmed to a
            fixed T (30 s for parity with Whisper checkpoints).

    Returns:
        (B, T // hop, n_mels) log-mel features in [-1, ~1].
    """
    cos_b, sin_b = _dft_basis(n_fft)
    mel_w = mel_filterbank(n_mels, n_fft)

    frames = frame_signal(audio.astype(jnp.float32), n_fft, hop)
    # torch.stft keeps 1 + T/hop frames; Whisper drops the final one.
    frames = frames[:, : audio.shape[-1] // hop, :]
    real = frames @ jnp.asarray(cos_b)
    imag = frames @ jnp.asarray(sin_b)
    power = real * real + imag * imag  # (B, F, n_freqs)

    mel = power @ jnp.asarray(mel_w)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    )
    return ((log_spec + 4.0) / 4.0).astype(dtype)
