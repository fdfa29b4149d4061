"""Tests for the text pipeline: numerals, normalisation, and the CTC tokeniser.

The numeral vectors and the normalisation grid pin the same behaviour the reference
pins in its ``tests/test_utils.py`` and ``tests/test_data.py``.
"""

import json

import pytest

from coral_tpu.text import (
    CtcTokenizer,
    clean_transcription,
    convert_numeral_to_words,
    dump_vocabulary,
)

CHARACTERS_TO_KEEP = "abcdefghijklmnopqrstuvwxyzæøå0123456789éü"


@pytest.mark.parametrize(
    argnames=["numeral", "expected"],
    argvalues=[
        ("0", "nul"),
        ("1", "en"),
        ("2", "to"),
        ("3", "tre"),
        ("4", "fire"),
        ("5", "fem"),
        ("6", "seks"),
        ("7", "syv"),
        ("8", "otte"),
        ("9", "ni"),
        ("10", "ti"),
        ("11", "elleve"),
        ("12", "tolv"),
        ("13", "tretten"),
        ("14", "fjorten"),
        ("15", "femten"),
        ("16", "seksten"),
        ("17", "sytten"),
        ("18", "atten"),
        ("19", "nitten"),
        ("20", "tyve"),
        ("21", "enogtyve"),
        ("22", "toogtyve"),
        ("23", "treogtyve"),
        ("24", "fireogtyve"),
        ("25", "femogtyve"),
        ("26", "seksogtyve"),
        ("27", "syvogtyve"),
        ("28", "otteogtyve"),
        ("29", "niogtyve"),
        ("30", "tredive"),
        ("40", "fyrre"),
        ("50", "halvtreds"),
        ("60", "tres"),
        ("70", "halvfjerds"),
        ("80", "firs"),
        ("90", "halvfems"),
        ("100", "hundrede"),
        ("101", "et hundrede og en"),
        ("110", "et hundrede og ti"),
        ("121", "et hundrede og enogtyve"),
        ("200", "to hundrede"),
        ("999", "ni hundrede og nioghalvfems"),
        ("1000", "tusind"),
        ("1001", "et tusind og en"),
        ("1010", "et tusind og ti"),
        ("1100", "et tusind et hundrede"),
        ("1121", "et tusind et hundrede og enogtyve"),
        ("2000", "to tusind"),
        ("10.000", "ti tusind"),
        ("100.000", "et hundrede tusind"),
        ("100000", "et hundrede tusind"),
        ("999.999", "ni hundrede og nioghalvfems tusind ni hundrede og nioghalvfems"),
        ("999999", "ni hundrede og nioghalvfems tusind ni hundrede og nioghalvfems"),
        ("1.000.000", "en million"),
        ("1.000000", "1.000000"),
        ("1.0.00000", "1.0.00000"),
        ("1.000.001", "en million og en"),
        ("10.000.000", "ti millioner"),
        ("100.000.000", "et hundrede millioner"),
        (
            "999.999.999",
            "ni hundrede og nioghalvfems millioner ni hundrede og nioghalvfems tusind "
            "ni hundrede og nioghalvfems",
        ),
        ("10,123", "ti komma et to tre"),
        ("10.102,92", "ti tusind et hundrede og to komma ni to"),
    ],
)
def test_convert_numeral_to_words(numeral: str, expected: str) -> None:
    """The Danish numeral vectors from the reference test suite."""
    assert convert_numeral_to_words(numeral=numeral) == expected


class TestCleanTranscription:
    """The reference's 12-case `process_example` grid (tests/test_data.py:72-235)."""

    transcription = "\nThis is a (test) [sentence]́ with \n{aa} and ğ. "

    empty_conversion_dict: dict[str, str] = {}
    diacritics_conversion_dict = {"aa": "å", "ğ": "g"}
    empty_whitespace_conversion_dict = {"́": " "}

    all_characters = (
        set(transcription)
        | set(diacritics_conversion_dict.values())
        | set(empty_whitespace_conversion_dict.values())
    )
    no_parentheses = all_characters - set("()[]{}")
    no_newlines = all_characters - set("\n\r")

    @pytest.mark.parametrize(
        argnames=["characters_to_keep", "conversion_dict", "lower_case", "expected"],
        argvalues=[
            (all_characters, empty_conversion_dict, True,
             "this is a (test) [sentence]́ with\n{aa} and ğ."),
            (all_characters, empty_conversion_dict, False,
             "This is a (test) [sentence]́ with\n{aa} and ğ."),
            (None, empty_conversion_dict, True,
             "this is a (test) [sentence]́ with\n{aa} and ğ."),
            (all_characters, diacritics_conversion_dict, True,
             "this is a (test) [sentence]́ with\n{å} and g."),
            (all_characters, empty_whitespace_conversion_dict, True,
             "this is a (test) [sentence] with\n{aa} and ğ."),
            (no_parentheses, empty_conversion_dict, True,
             "this is a test sentence ́ with\naa and ğ."),
            (no_parentheses, diacritics_conversion_dict, True,
             "this is a test sentence ́ with\nå and g."),
            (no_parentheses, empty_whitespace_conversion_dict, True,
             "this is a test sentence with\naa and ğ."),
            (no_newlines, empty_conversion_dict, True,
             "this is a (test) [sentence]́ with {aa} and ğ."),
            (no_newlines, diacritics_conversion_dict, True,
             "this is a (test) [sentence]́ with {å} and g."),
            (no_newlines, empty_whitespace_conversion_dict, True,
             "this is a (test) [sentence] with {aa} and ğ."),
        ],
    )
    def test_grid(self, characters_to_keep, conversion_dict, lower_case,
                  expected) -> None:
        result = clean_transcription(
            self.transcription,
            characters_to_keep=characters_to_keep,
            conversion_dict=conversion_dict,
            lower_case=lower_case,
        )
        assert result == expected

    def test_filler_words_removed(self) -> None:
        assert clean_transcription(
            "jeg ehh tror øhm at hmm det er rigtigt",
            characters_to_keep=CHARACTERS_TO_KEEP,
        ) == "jeg tror at det er rigtigt"

    def test_numerals_converted(self) -> None:
        assert clean_transcription(
            "der er 21 heste",
            characters_to_keep=CHARACTERS_TO_KEEP,
            convert_numerals=True,
        ) == "der er enogtyve heste"


class TestCtcTokenizer:
    """Vocabulary and round-trip parity with the HF Wav2Vec2CTCTokenizer setup."""

    def test_vocab_layout_matches_hf(self, tmp_path) -> None:
        """Our vocab must match Wav2Vec2CTCTokenizer's id assignment exactly."""
        from transformers import Wav2Vec2CTCTokenizer

        dump_vocabulary(CHARACTERS_TO_KEEP, tmp_path)
        hf_tok = Wav2Vec2CTCTokenizer.from_pretrained(
            str(tmp_path),
            pad_token="<pad>",
            unk_token="<unk>",
            bos_token="<s>",
            eos_token="</s>",
            word_delimiter_token="|",
            replace_word_delimiter_char=" ",
        )
        ours = CtcTokenizer.from_characters(CHARACTERS_TO_KEEP)
        assert ours.vocab == hf_tok.get_vocab()
        assert ours.pad_token_id == hf_tok.pad_token_id
        assert ours.bos_token_id == hf_tok.bos_token_id
        assert ours.eos_token_id == hf_tok.eos_token_id
        assert ours.unk_token_id == hf_tok.unk_token_id

    def test_encode_matches_hf(self, tmp_path) -> None:
        from transformers import Wav2Vec2CTCTokenizer

        dump_vocabulary(CHARACTERS_TO_KEEP, tmp_path)
        hf_tok = Wav2Vec2CTCTokenizer.from_pretrained(
            str(tmp_path), pad_token="<pad>", unk_token="<unk>", bos_token="<s>",
            eos_token="</s>", word_delimiter_token="|",
            replace_word_delimiter_char=" ",
        )
        ours = CtcTokenizer.from_characters(CHARACTERS_TO_KEEP)
        for text in ["hej med dig", "æøå 123", "det var så det"]:
            assert ours.encode(text) == hf_tok(text).input_ids

    def test_ctc_collapse_decode(self) -> None:
        tok = CtcTokenizer.from_characters(CHARACTERS_TO_KEEP)
        blank = tok.blank_id
        h, e, j, d = (tok.vocab[c] for c in "hejd")
        delim = tok.vocab["|"]
        ids = [blank, h, h, e, blank, j, j, delim, blank, d, tok.vocab["u"], blank]
        assert tok.decode(ids) == "hej du"

    def test_roundtrip(self, tmp_path) -> None:
        tok = CtcTokenizer.from_characters(CHARACTERS_TO_KEEP)
        tok.save_pretrained(tmp_path)
        reloaded = CtcTokenizer.from_pretrained(tmp_path)
        assert reloaded.vocab == tok.vocab
        text = "hej verden"
        assert reloaded.decode(reloaded.encode(text), group_tokens=False) == text

    def test_dump_vocabulary_excludes_specials(self, tmp_path) -> None:
        path = dump_vocabulary(CHARACTERS_TO_KEEP, tmp_path)
        vocab = json.loads(path.read_text())
        assert "<pad>" not in vocab
        assert len(vocab) == len(set(CHARACTERS_TO_KEEP)) + 1
