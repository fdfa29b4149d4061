"""Frame-exact parity of the generation post-processors against HF.

The reference reaches timestamp decoding and beam search through
``transformers`` (``src/coral/whisper.py:214-230`` ``predict_with_generate``,
``src/coral/evaluate.py:47-74`` pipeline ``return_timestamps``). transformers
and torch are installed offline, so these tests pin our jit-compatible
re-implementations frame-by-frame / sequence-by-sequence against the real
library rather than against hand-derived fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers.generation.logits_process import (
    WhisperTimeStampLogitsProcessor,
)

from coral_tpu.models.convert import whisper_params_from_torch
from coral_tpu.models.whisper import (
    WhisperConfig,
    apply_timestamp_rules,
    beam_generate,
)

VOCAB = 96
EOS = 80
TS_BEGIN = 88  # ids 88..95 are "timestamps" in this toy vocab
NO_TS = TS_BEGIN - 1


class _GenCfg:
    """Duck-typed GenerationConfig carrying what the HF processor reads."""

    no_timestamps_token_id = NO_TS
    eos_token_id = EOS
    max_initial_timestamp_index = 5


def _random_prefix(rng, n_forced, gen_len):
    """A generated suffix mixing text, specials, and timestamp tokens."""
    toks = []
    for _ in range(gen_len):
        r = rng.random()
        if r < 0.45:
            toks.append(int(rng.integers(0, EOS)))  # text
        elif r < 0.55:
            toks.append(int(rng.integers(EOS, TS_BEGIN)))  # specials
        else:
            toks.append(int(rng.integers(TS_BEGIN, VOCAB)))  # timestamps
    return [81] * n_forced + toks


@pytest.mark.parametrize("gen_len", [0, 1, 2, 5, 9])
def test_timestamp_rules_match_hf_processor(gen_len):
    rng = np.random.default_rng(17 + gen_len)
    n_forced, N, L = 3, 16, 20
    pos = n_forced + gen_len - 1

    rows = [_random_prefix(rng, n_forced, gen_len) for _ in range(N)]
    cur = np.asarray(rows, dtype=np.int64)  # (N, pos+1)
    buffer = np.full((N, L), EOS, dtype=np.int32)
    buffer[:, : pos + 1] = cur
    logits = rng.standard_normal((N, VOCAB)).astype(np.float32) * 3

    proc = WhisperTimeStampLogitsProcessor(
        _GenCfg(), begin_index=n_forced, _detect_timestamp_from_logprob=True
    )
    want = proc(
        torch.from_numpy(cur), torch.from_numpy(logits.copy())
    ).numpy()

    got = np.asarray(
        apply_timestamp_rules(
            jnp.asarray(logits),
            jnp.asarray(buffer),
            jnp.asarray(pos, jnp.int32),
            n_forced,
            TS_BEGIN,
            EOS,
            max_initial_index=_GenCfg.max_initial_timestamp_index,
        )
    )

    want_masked = ~np.isfinite(want)
    got_masked = got <= -1e29  # ours uses a large finite negative
    np.testing.assert_array_equal(got_masked, want_masked)
    np.testing.assert_allclose(
        got[~got_masked], want[~want_masked], rtol=1e-6
    )


@pytest.fixture(scope="module")
def hf_pair():
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


def _hf_beam(hf_model, feats, forced, **kw):
    """Run the generic `GenerationMixin.generate` beam path (whisper's own
    `generate` wrapper only adds task/language plumbing on top of it)."""
    from transformers.generation import GenerationMixin

    with torch.no_grad():
        out = GenerationMixin.generate(
            hf_model,
            input_features=torch.tensor(feats).transpose(1, 2),
            decoder_input_ids=torch.tensor(
                np.tile(forced, (feats.shape[0], 1))
            ),
            do_sample=False,
            # pad with EOS so padding matches our eos-filled buffers
            pad_token_id=2, eos_token_id=2, bos_token_id=1,
            **kw,
        )
    return out.numpy()


@pytest.mark.parametrize(
    "num_beams,length_penalty", [(2, 1.0), (3, 0.0), (5, 1.0), (5, 2.0)]
)
def test_beam_generate_matches_hf(hf_pair, num_beams, length_penalty):
    hf_model, config, params = hf_pair
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((3, 300, 80)).astype(np.float32)
    forced = np.asarray([1, 5, 7], np.int64)
    max_length = 20

    want = _hf_beam(
        hf_model, feats, forced, num_beams=num_beams,
        length_penalty=length_penalty, max_length=max_length,
    )
    got = np.asarray(beam_generate(
        params, config, feats, forced.astype(np.int32),
        max_length=max_length, eos_id=2, num_beams=num_beams,
        length_penalty=length_penalty,
    ))
    # HF crops to the longest produced row; ours is eos-padded to max_length.
    padded = np.full((want.shape[0], max_length), 2, dtype=np.int64)
    padded[:, : want.shape[1]] = want
    np.testing.assert_array_equal(got, padded)


def test_beam_generate_matches_hf_early_stopping(hf_pair):
    hf_model, config, params = hf_pair
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, 300, 80)).astype(np.float32)
    forced = np.asarray([1, 5, 7], np.int64)

    want = _hf_beam(
        hf_model, feats, forced, num_beams=4, length_penalty=1.0,
        max_length=24, early_stopping=True,
    )
    got = np.asarray(beam_generate(
        params, config, feats, forced.astype(np.int32), max_length=24,
        eos_id=2, num_beams=4, length_penalty=1.0, early_stopping=True,
    ))
    padded = np.full((want.shape[0], 24), 2, dtype=np.int64)
    padded[:, : want.shape[1]] = want
    np.testing.assert_array_equal(got, padded)


def test_timestamp_rules_match_hf_under_greedy_rollout():
    """Roll a greedy decode forward applying both processors step by step;
    the chosen tokens (hence the whole trajectory) must agree."""
    rng = np.random.default_rng(5)
    n_forced, N, L = 3, 4, 14
    proc = WhisperTimeStampLogitsProcessor(
        _GenCfg(), begin_index=n_forced, _detect_timestamp_from_logprob=True
    )
    buffer = np.full((N, L), EOS, dtype=np.int32)
    buffer[:, :n_forced] = 81
    hf_ids = torch.full((N, n_forced), 81, dtype=torch.long)
    for pos in range(n_forced - 1, L - 1):
        logits = rng.standard_normal((N, VOCAB)).astype(np.float32) * 2
        want = proc(hf_ids, torch.from_numpy(logits.copy())).numpy()
        got = np.asarray(
            apply_timestamp_rules(
                jnp.asarray(logits), jnp.asarray(buffer),
                jnp.asarray(pos, jnp.int32), n_forced, TS_BEGIN, EOS,
                max_initial_index=_GenCfg.max_initial_timestamp_index,
            )
        )
        nxt_want = want.argmax(-1)
        nxt_got = got.argmax(-1)
        np.testing.assert_array_equal(nxt_got, nxt_want)
        hf_ids = torch.cat(
            [hf_ids, torch.from_numpy(nxt_want)[:, None]], dim=1
        )
        buffer[:, pos + 1] = nxt_got
