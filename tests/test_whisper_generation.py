"""Beam search + timestamp generation tests (tiny Whisper, CPU).

Covers the reference's generation surface (``predict_with_generate`` with
``generation_max_length`` / beams, reference: ``src/coral/whisper.py:214-230``)
and the HF pipeline's ``return_timestamps`` long-form path (reference:
``src/coral/evaluate.py:47-74``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coral_tpu.models.whisper import (
    WhisperConfig,
    beam_generate,
    forward,
    greedy_generate,
    init_whisper_params,
    segments_from_tokens,
)

VOCAB = 96
EOS = 80
SOT = 81
TS_BEGIN = 88  # ids 88..95 are "timestamps" in this toy vocab
MAX_LEN = 16


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig.tiny_test(vocab_size=VOCAB)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((2, 100, cfg.num_mel_bins)), jnp.float32
    )
    forced = jnp.asarray([SOT, 82, 83], jnp.int32)
    return cfg, params, feats, forced


def _teacher_forced_logprob(params, cfg, feats, ids, n_forced):
    """Sum log P of the generated tokens (incl. first EOS) given the prompt."""
    inputs = ids[:, :-1]
    logits = forward(params, cfg, feats, inputs, deterministic=True)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    targets = ids[:, 1:]
    tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    # count up to and including the first EOS after the prompt
    gen = np.asarray(targets)
    totals = []
    for b in range(gen.shape[0]):
        total = 0.0
        for t in range(n_forced - 1, gen.shape[1]):
            total += float(tok_lp[b, t])
            if gen[b, t] == EOS:
                break
        totals.append(total)
    return np.asarray(totals)


def test_beam_one_matches_greedy(setup):
    cfg, params, feats, forced = setup
    greedy = greedy_generate(
        params, cfg, feats, forced, max_length=MAX_LEN, eos_id=EOS
    )
    beam1 = beam_generate(
        params, cfg, feats, forced, max_length=MAX_LEN, eos_id=EOS,
        num_beams=1,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_beam_output_shape_and_prompt(setup):
    cfg, params, feats, forced = setup
    out = np.asarray(beam_generate(
        params, cfg, feats, forced, max_length=MAX_LEN, eos_id=EOS,
        num_beams=4,
    ))
    assert out.shape == (2, MAX_LEN)
    np.testing.assert_array_equal(out[:, :3], np.tile(np.asarray(forced), (2, 1)))


def test_beam_improves_teacher_forced_likelihood(setup):
    """Beam=5 must find sequences at least as likely as greedy's (the point of
    beam search); compare raw sum log-probabilities, no length penalty."""
    cfg, params, feats, forced = setup
    greedy = np.asarray(greedy_generate(
        params, cfg, feats, forced, max_length=MAX_LEN, eos_id=EOS
    ))
    beam = np.asarray(beam_generate(
        params, cfg, feats, forced, max_length=MAX_LEN, eos_id=EOS,
        num_beams=5, length_penalty=0.0,
    ))
    lp_greedy = _teacher_forced_logprob(params, cfg, feats, greedy, 3)
    lp_beam = _teacher_forced_logprob(params, cfg, feats, beam, 3)
    assert np.all(lp_beam >= lp_greedy - 1e-3), (lp_beam, lp_greedy)


def test_beam_deterministic(setup):
    cfg, params, feats, forced = setup
    a = np.asarray(beam_generate(
        params, cfg, feats, forced, max_length=MAX_LEN, eos_id=EOS, num_beams=3
    ))
    b = np.asarray(beam_generate(
        params, cfg, feats, forced, max_length=MAX_LEN, eos_id=EOS, num_beams=3
    ))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("generate", ["greedy", "beam"])
def test_timestamp_grammar(setup, generate):
    cfg, params, feats, forced = setup
    kw = dict(
        max_length=MAX_LEN, eos_id=EOS, timestamps=True,
        timestamp_begin=TS_BEGIN,
    )
    if generate == "greedy":
        out = greedy_generate(params, cfg, feats, forced, **kw)
    else:
        out = beam_generate(params, cfg, feats, forced, num_beams=3, **kw)
    out = np.asarray(out)
    for row in out:
        gen = [t for t in row[3:]]
        # cut at first EOS
        if EOS in gen:
            gen = gen[: gen.index(EOS)]
        assert len(gen) >= 1
        # opens with a timestamp
        assert gen[0] >= TS_BEGIN
        # notimestamps never emitted
        assert all(t != TS_BEGIN - 1 for t in gen)
        # timestamps non-decreasing
        ts = [t for t in gen if t >= TS_BEGIN]
        assert ts == sorted(ts)
        # no three timestamps in a row
        run = 0
        for t in gen:
            run = run + 1 if t >= TS_BEGIN else 0
            assert run <= 2


def test_segments_from_tokens_roundtrip():
    # <|0.00|> hello <|0.10|> <|0.10|> world <|0.20|> EOS
    ids = [SOT, 82, 83, TS_BEGIN, 10, 11, TS_BEGIN + 5, TS_BEGIN + 5, 12,
           TS_BEGIN + 7, EOS, EOS]
    segs = segments_from_tokens(ids, TS_BEGIN, EOS)
    assert segs == [
        (0.0, 0.1, [10, 11]),
        (0.1, pytest.approx(0.14), [12]),
    ]


def test_segments_trailing_open_segment():
    ids = [TS_BEGIN + 1, 20, 21]  # never closed, no EOS
    segs = segments_from_tokens(ids, TS_BEGIN, EOS)
    assert segs == [(pytest.approx(0.02), pytest.approx(0.02), [20, 21])]


def test_phased_decode_matches_single_phase(setup, monkeypatch):
    """The bucketed (phased) decode loop is a pure execution-schedule change:
    greedy and beam outputs must be bit-identical to the single full-length
    while_loop (CORAL_DECODE_PHASED=0). max_length=80 spans two buckets
    (64, 80); the short-test fixtures elsewhere stay single-phase, so this
    is the only coverage of the phase-boundary cache pad."""
    cfg, params, feats, forced = setup
    kw = dict(max_length=80, eos_id=EOS)

    monkeypatch.setenv("CORAL_DECODE_PHASED", "0")
    g_ref = np.asarray(greedy_generate(params, cfg, feats, forced, **kw))
    b_ref = np.asarray(
        beam_generate(params, cfg, feats, forced, num_beams=3, **kw)
    )
    monkeypatch.delenv("CORAL_DECODE_PHASED")
    g_ph = np.asarray(greedy_generate(params, cfg, feats, forced, **kw))
    b_ph = np.asarray(
        beam_generate(params, cfg, feats, forced, num_beams=3, **kw)
    )
    np.testing.assert_array_equal(g_ref, g_ph)
    np.testing.assert_array_equal(b_ref, b_ph)
