"""Tests for the WER/CER metrics."""

import pytest

from coral_tpu.evaluation.metrics import cer, levenshtein_counts, wer


class TestLevenshteinCounts:
    def test_identical(self) -> None:
        counts = levenshtein_counts(list("abc"), list("abc"))
        assert counts == (3, 0, 0, 0)

    def test_substitution(self) -> None:
        counts = levenshtein_counts(list("abc"), list("axc"))
        assert counts.substitutions == 1 and counts.hits == 2

    def test_deletion(self) -> None:
        counts = levenshtein_counts(list("abc"), list("ac"))
        assert counts.deletions == 1 and counts.hits == 2

    def test_insertion(self) -> None:
        counts = levenshtein_counts(list("ac"), list("abc"))
        assert counts.insertions == 1 and counts.hits == 2

    def test_empty_reference(self) -> None:
        assert levenshtein_counts([], list("ab")) == (0, 0, 0, 2)

    def test_empty_hypothesis(self) -> None:
        assert levenshtein_counts(list("ab"), []) == (0, 0, 2, 0)

    def test_counts_are_consistent(self) -> None:
        ref, hyp = list("kitten"), list("sitting")
        h, s, d, i = levenshtein_counts(ref, hyp)
        assert h + s + d == len(ref)
        assert h + s + i == len(hyp)
        assert s + d + i == 3  # classic kitten->sitting distance


class TestWer:
    def test_perfect(self) -> None:
        assert wer(["hej med dig"], ["hej med dig"]) == 0.0

    def test_one_substitution(self) -> None:
        # 1 substitution over 3 reference words
        assert wer(["hej uden dig"], ["hej med dig"]) == pytest.approx(1 / 3)

    def test_corpus_aggregation(self) -> None:
        # Aggregated over the corpus: 1 error over 5 total words — NOT the mean of
        # per-sentence rates (which would be (1/2 + 0/3)/2 = 0.25).
        preds = ["et to", "a b c"]
        labels = ["et tre", "a b c"]
        assert wer(preds, labels) == pytest.approx(1 / 5)

    def test_normalise_bounds_at_one(self) -> None:
        # All-insertions case: unnormalised WER would exceed 100%.
        assert wer(["a b c d"], ["a"], normalise=True) <= 1.0
        assert wer(["a b c d"], ["a"], normalise=False) == pytest.approx(3 / 1)

    def test_multiple_spaces_collapsed(self) -> None:
        assert wer(["hej  med   dig"], ["hej med dig"]) == 0.0


class TestCer:
    def test_perfect(self) -> None:
        assert cer(["abc"], ["abc"]) == 0.0

    def test_one_char(self) -> None:
        assert cer(["abd"], ["abc"]) == pytest.approx(1 / 3)

    def test_spaces_count(self) -> None:
        # internal spaces are characters for CER
        assert cer(["ab"], ["a b"]) == pytest.approx(1 / 3)

    def test_normalise(self) -> None:
        assert cer(["abcd"], ["a"], normalise=True) == pytest.approx(3 / 4)
        assert cer(["abcd"], ["a"], normalise=False) == pytest.approx(3 / 1)
