"""On-device waveform augmentation.

The reference augments per-sample on CPU dataloader workers with
torch-audiomentations (reference: ``src/coral/data.py:710-738``): peak
normalisation, random gain, background noise from ESC-50 (p=0.7), colored noise
(p=0.2), and one of band/band-stop/high/low-pass filters (p=0.2). Here the whole
chain runs batched on device inside the jitted train step:

- elementwise ops (peak norm, gain, mixing) are VPU work fused by XLA;
- filters apply as frequency-domain masks over an rFFT — the TPU-native
  equivalent of the FIR/IIR filters the reference's augmentation library uses
  (XLA's TPU FFT replaces a serial IIR scan);
- per-sample Bernoulli application: both branches are computed and selected,
  which is the branch-free idiom XLA wants;
- the background-noise bank (ESC-50) lives in HBM as a (N, T) tensor.

All randomness is stateless (jax PRNG keys threaded from the train step).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    """Probabilities and ranges mirroring the reference's augmentation chain."""

    gain_db_min: float = -18.0
    gain_db_max: float = 6.0
    background_noise_p: float = 0.7
    background_snr_db_min: float = 3.0
    background_snr_db_max: float = 30.0
    colored_noise_p: float = 0.2
    colored_snr_db_min: float = 3.0
    colored_snr_db_max: float = 30.0
    colored_f_decay_min: float = -2.0
    colored_f_decay_max: float = 2.0
    filter_p: float = 0.2
    low_pass_hz: tuple[float, float] = (150.0, 7500.0)
    high_pass_hz: tuple[float, float] = (20.0, 2400.0)
    band_center_hz: tuple[float, float] = (200.0, 4000.0)
    band_width_fraction: tuple[float, float] = (0.5, 1.99)
    sample_rate: int = 16_000


def peak_normalize(audio: jnp.ndarray) -> jnp.ndarray:
    """Scale each sample so its absolute peak is 1 (skip near-silent samples)."""
    peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True)
    return jnp.where(peak > 1e-8, audio / jnp.maximum(peak, 1e-8), audio)


def _rms(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1.0)
    return jnp.sqrt(jnp.sum((x * mask) ** 2, axis=-1, keepdims=True) / n)


def _mix_at_snr(
    audio: jnp.ndarray, noise: jnp.ndarray, snr_db: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mix noise into audio at the given per-sample SNR (dB)."""
    signal_rms = _rms(audio, mask)
    noise_rms = jnp.maximum(_rms(noise, mask), 1e-8)
    target_noise_rms = signal_rms / (10.0 ** (snr_db[:, None] / 20.0))
    return audio + noise * (target_noise_rms / noise_rms) * mask


def add_colored_noise(
    rng: jax.Array, audio: jnp.ndarray, mask: jnp.ndarray, cfg: AugmentConfig
) -> jnp.ndarray:
    """Add noise with spectrum ~ f^(-decay/2), at a random SNR."""
    B, T = audio.shape
    k_white, k_snr, k_decay = jax.random.split(rng, 3)
    white = jax.random.normal(k_white, (B, T), dtype=audio.dtype)
    decay = jax.random.uniform(
        k_decay, (B,), minval=cfg.colored_f_decay_min, maxval=cfg.colored_f_decay_max
    )
    freqs = jnp.fft.rfftfreq(T, d=1.0)  # normalised
    spec = jnp.fft.rfft(white, axis=-1)
    shaping = jnp.where(
        freqs[None, :] > 0, freqs[None, :] ** (decay[:, None] / 2.0), 1.0
    )
    colored = jnp.fft.irfft(spec * shaping, n=T, axis=-1).astype(audio.dtype)
    snr = jax.random.uniform(
        k_snr, (B,), minval=cfg.colored_snr_db_min, maxval=cfg.colored_snr_db_max
    )
    return _mix_at_snr(audio, colored, snr, mask)


def add_background_noise(
    rng: jax.Array,
    audio: jnp.ndarray,
    mask: jnp.ndarray,
    noise_bank: jnp.ndarray,
    cfg: AugmentConfig,
) -> jnp.ndarray:
    """Mix a random slice of the HBM-resident noise bank into each sample."""
    B, T = audio.shape
    N, NT = noise_bank.shape
    k_idx, k_off, k_snr = jax.random.split(rng, 3)
    idx = jax.random.randint(k_idx, (B,), 0, N)
    max_off = max(NT - T, 1)
    off = jax.random.randint(k_off, (B,), 0, max_off)

    def slice_one(i, o):
        return jax.lax.dynamic_slice(noise_bank[i], (o,), (min(T, NT),))

    noise = jax.vmap(slice_one)(idx, off)
    if NT < T:  # tile short noise clips
        reps = -(-T // NT)
        noise = jnp.tile(noise, (1, reps))[:, :T]
    snr = jax.random.uniform(
        k_snr, (B,), minval=cfg.background_snr_db_min,
        maxval=cfg.background_snr_db_max,
    )
    return _mix_at_snr(audio, noise.astype(audio.dtype), snr, mask)


def random_filter(
    rng: jax.Array, audio: jnp.ndarray, cfg: AugmentConfig
) -> jnp.ndarray:
    """Apply one of {low-pass, high-pass, band-pass, band-stop} per sample.

    Implemented as smooth frequency-domain masks over the rFFT (raised-cosine
    rolloff), matching the augmentation intent of the reference's FIR/IIR filter
    bank in a TPU-friendly form.
    """
    B, T = audio.shape
    sr = cfg.sample_rate
    k_kind, k_lo, k_hi, k_c, k_w = jax.random.split(rng, 5)
    kind = jax.random.randint(k_kind, (B,), 0, 4)  # 0=bp 1=bs 2=hp 3=lp

    freqs = jnp.fft.rfftfreq(T, d=1.0 / sr)  # (F,) Hz

    def log_uniform(key, lo, hi, shape):
        return jnp.exp(
            jax.random.uniform(key, shape, minval=jnp.log(lo), maxval=jnp.log(hi))
        )

    lp_cut = log_uniform(k_lo, *cfg.low_pass_hz, (B,))
    hp_cut = log_uniform(k_hi, *cfg.high_pass_hz, (B,))
    center = log_uniform(k_c, *cfg.band_center_hz, (B,))
    width_frac = jax.random.uniform(
        k_w, (B,), minval=cfg.band_width_fraction[0],
        maxval=cfg.band_width_fraction[1],
    )
    band_lo = center * (1 - width_frac / 2)
    band_hi = center * (1 + width_frac / 2)

    def smooth_step(f, cut, rolloff=0.1):
        # 0 below cut*(1-r), 1 above cut*(1+r), raised-cosine in between
        lo, hi = cut * (1 - rolloff), cut * (1 + rolloff)
        x = jnp.clip((f - lo[:, None]) / jnp.maximum(hi - lo, 1.0)[:, None], 0, 1)
        return 0.5 - 0.5 * jnp.cos(jnp.pi * x)

    hp_mask = smooth_step(freqs[None, :], hp_cut)
    lp_mask = 1.0 - smooth_step(freqs[None, :], lp_cut)
    bp_mask = smooth_step(freqs[None, :], band_lo) * (
        1.0 - smooth_step(freqs[None, :], band_hi)
    )
    bs_mask = 1.0 - bp_mask

    mask = jnp.select(
        [kind[:, None] == 0, kind[:, None] == 1, kind[:, None] == 2],
        [bp_mask, bs_mask, hp_mask],
        lp_mask,
    )
    spec = jnp.fft.rfft(audio, axis=-1)
    return jnp.fft.irfft(spec * mask, n=T, axis=-1).astype(audio.dtype)


def augment_batch(
    rng: jax.Array,
    audio: jnp.ndarray,
    lengths: jnp.ndarray,
    noise_bank: jnp.ndarray | None = None,
    cfg: AugmentConfig = AugmentConfig(),
) -> jnp.ndarray:
    """Run the full train-time augmentation chain on a padded batch.

    Order mirrors the reference chain (``src/coral/data.py:710-735``):
    peak-norm -> gain -> background noise (p) -> colored noise (p) -> filter (p).
    """
    B, T = audio.shape
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(audio.dtype)
    keys = jax.random.split(rng, 8)

    x = peak_normalize(audio * mask)

    gain_db = jax.random.uniform(
        keys[0], (B,), minval=cfg.gain_db_min, maxval=cfg.gain_db_max
    )
    x = x * (10.0 ** (gain_db[:, None] / 20.0))

    if noise_bank is not None and cfg.background_noise_p > 0:
        apply = jax.random.bernoulli(keys[1], cfg.background_noise_p, (B,))
        with_noise = add_background_noise(keys[2], x, mask, noise_bank, cfg)
        x = jnp.where(apply[:, None], with_noise, x)

    if cfg.colored_noise_p > 0:
        apply = jax.random.bernoulli(keys[3], cfg.colored_noise_p, (B,))
        with_noise = add_colored_noise(keys[4], x, mask, cfg)
        x = jnp.where(apply[:, None], with_noise, x)

    if cfg.filter_p > 0:
        apply = jax.random.bernoulli(keys[5], cfg.filter_p, (B,))
        filtered = random_filter(keys[6], x, cfg)
        x = jnp.where(apply[:, None], filtered, x)

    return x * mask
