"""Whisper tokeniser tests: special-token layout parity and BPE round-trips."""

import numpy as np
import pytest

from coral_tpu.text.bpe import ByteLevelBPE, bytes_to_unicode
from coral_tpu.text.whisper_tokenizer import WHISPER_LANGUAGES, WhisperTokenizer


def test_language_order_matches_hf():
    """Our language order must equal HF's (it defines the special-token ids)."""
    from transformers.models.whisper.tokenization_whisper import LANGUAGES

    hf_langs = list(LANGUAGES.keys())
    assert hf_langs[:99] == list(WHISPER_LANGUAGES)
    assert hf_langs[99:] in ([], ["yue"])  # v3 extension


def test_special_token_ids_match_published_checkpoints():
    """Id arithmetic over a 50257-entry BPE = openai/whisper multilingual ids."""
    fake_bpe = ByteLevelBPE({f"tok{i}": i for i in range(50_257)}, [])
    tok = WhisperTokenizer(fake_bpe, language="da")
    assert tok.eos_token_id == 50_257
    assert tok.sot_token_id == 50_258
    assert tok.language_token_id == 50_285  # <|da|>
    assert tok.transcribe_token_id == 50_359
    assert tok.notimestamps_token_id == 50_363
    assert tok.timestamp_begin == 50_364
    assert tok.vocab_size == 51_865


def test_byte_bpe_roundtrip():
    bpe = ByteLevelBPE.byte_fallback()
    for text in ["hej med dig", "æøå ÆØÅ", "tal 123, punktum."]:
        assert bpe.decode(bpe.encode(text)) == text


def test_bpe_merges_apply():
    b2u = bytes_to_unicode()
    h, e, j = (b2u[ord(c)] for c in "hej")
    vocab = {h: 0, e: 1, j: 2, h + e: 3, h + e + j: 4}
    bpe = ByteLevelBPE(vocab, [(h, e), (h + e, j)])
    assert bpe.encode("hej") == [4]
    assert bpe.decode([4]) == "hej"


def test_encode_decode_with_prompt():
    tok = WhisperTokenizer.byte_fallback(language="da")
    ids = tok.encode("hej verden")
    # prompt body: [lang, task, notimestamps, ...bpe..., eot]
    assert ids[0] == tok.language_token_id
    assert ids[1] == tok.transcribe_token_id
    assert ids[2] == tok.notimestamps_token_id
    assert ids[-1] == tok.eos_token_id
    assert tok.decode(np.asarray(ids)) == "hej verden"


def test_forced_decoder_ids_structure():
    tok = WhisperTokenizer.byte_fallback(language="da", task="transcribe")
    forced = tok.forced_decoder_ids
    assert forced == [
        tok.sot_token_id, tok.language_token_id,
        tok.transcribe_token_id, tok.notimestamps_token_id,
    ]


def test_unknown_language_rejected():
    with pytest.raises(ValueError):
        WhisperTokenizer.byte_fallback(language="xx")
