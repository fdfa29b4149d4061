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

from coral_tpu.models.whisper import apply_timestamp_rules

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
