"""wav2vec2 input feature extraction: per-sample zero-mean/unit-variance.

The reference runs HF's ``Wav2Vec2FeatureExtractor(do_normalize=True)`` per sample on
CPU dataloader workers (reference: ``src/coral/wav2vec2.py:91-97``,
``src/coral/data.py:747-751``). Here the z-norm runs on device, fused into the jitted
train step, masked to each sample's valid length.
"""

from __future__ import annotations

import jax.numpy as jnp


def znorm(audio: jnp.ndarray, lengths: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Zero-mean / unit-variance normalise each sample over its valid region.

    Matches HF's ``Wav2Vec2FeatureExtractor.zero_mean_unit_var_norm`` (variance with
    denominator N, eps=1e-7 added to the variance); padded positions come out 0.

    Args:
        audio: (B, T) waveforms, zero-padded.
        lengths: (B,) valid sample counts.

    Returns:
        (B, T) normalised waveforms with zeros in the padding.
    """
    T = audio.shape[-1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(audio.dtype)
    n = jnp.maximum(lengths.astype(audio.dtype), 1.0)[:, None]
    mean = jnp.sum(audio * mask, axis=-1, keepdims=True) / n
    centred = (audio - mean) * mask
    var = jnp.sum(centred**2, axis=-1, keepdims=True) / n
    out = centred / jnp.sqrt(var + eps)
    return out * mask
