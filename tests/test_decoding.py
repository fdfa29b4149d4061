"""Native decoding stack tests: n-gram LM estimation and CTC beam search.

The LM normalisation test is the strongest check: for any context, the modified
Kneser-Ney probabilities (with backoff) must sum to 1 over the vocabulary —
this exercises discounting, interpolation, pruning mass redistribution, and the
backoff query path all at once.
"""

import numpy as np
import pytest

from coral_tpu.decoding import BeamSearchDecoder, NGramModel, build_native_library

CORPUS = [
    "jeg gik en tur i skoven",
    "jeg gik en tur i byen",
    "han gik hjem fra skolen",
    "hun gik en lang tur",
    "vi gik sammen i byen",
    "de gik hjem fra festen",
    "jeg bor i en lille by",
    "hun bor i byen",
    "han bor i skoven",
    "en tur i skoven er dejlig",
] * 3


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    build_native_library()
    tmp = tmp_path_factory.mktemp("ngram")
    corpus = tmp / "corpus.txt"
    corpus.write_text("\n".join(CORPUS), encoding="utf-8")
    return NGramModel.train(corpus, tmp / "3gram.arpa", order=3)


def _arpa_unigrams(arpa_path):
    words, in_unigrams = [], False
    for line in arpa_path.read_text(encoding="utf-8").splitlines():
        if line.startswith("\\1-grams:"):
            in_unigrams = True
            continue
        if in_unigrams:
            if not line.strip() or line.startswith("\\"):
                break
            words.append(line.split("\t")[1].split(" ")[0])
    return words


@pytest.mark.parametrize("context", ["", "jeg", "jeg gik", "gik en", "ukendt ord"])
def test_lm_distribution_normalised(lm, context):
    vocab = _arpa_unigrams(lm.arpa_path)
    total = sum(
        10.0 ** lm.logprob(w, context) for w in vocab if w != "<s>"
    )
    assert total == pytest.approx(1.0, abs=0.05)


def test_lm_prefers_seen_continuations(lm):
    assert lm.logprob("gik", "jeg") > lm.logprob("skoven", "jeg")
    assert lm.logprob("tur", "en") > lm.logprob("hjem", "en")


def test_lm_sentence_logprob_orders_sentences(lm):
    likely = lm.sentence_logprob("jeg gik en tur i skoven")
    unlikely = lm.sentence_logprob("skoven byen hjem jeg jeg jeg")
    assert likely > unlikely
    assert np.isfinite(likely) and np.isfinite(unlikely)


def test_arpa_contains_eos_unigram(lm):
    """The reference patches </s> into lmplz output (ngram.py:149-169); ours
    emits it natively."""
    assert "</s>" in _arpa_unigrams(lm.arpa_path)


def make_logits(text, vocab, peak=8.0):
    """(T, V) log-probs strongly peaked on the char sequence of `text`."""
    t2i = {c: i for i, c in enumerate(vocab)}
    ids = [t2i["|" if c == " " else c] for c in text]
    blank = len(vocab) - 1
    seq = []
    for i in ids:
        seq.extend([i, blank])
    logits = np.full((len(seq), len(vocab)), -peak, dtype=np.float32)
    for t, i in enumerate(seq):
        logits[t, i] = peak
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return logp.astype(np.float32)


VOCAB = list("abdeghijklmnorstuvy æøå") + ["|", "<pad>"]


@pytest.fixture(scope="module")
def acoustic_vocab():
    vocab = [c for c in VOCAB if c != " "]
    return vocab, len(vocab) - 1, vocab.index("|")


def test_beam_search_greedy_path(acoustic_vocab):
    vocab, blank, sep = acoustic_vocab
    decoder = BeamSearchDecoder(vocab, blank_id=blank, word_sep_id=sep)
    logp = make_logits("jeg gik en tur", vocab)
    assert decoder.decode(logp) == "jeg gik en tur"


def test_beam_search_with_lm_rescores(lm, acoustic_vocab):
    vocab, blank, sep = acoustic_vocab
    # Ambiguate the final character of "skoven" vs "skoves" acoustically; the
    # LM should pick the word it has seen.
    decoder = BeamSearchDecoder(
        vocab, blank_id=blank, word_sep_id=sep, lm=lm, alpha=2.0, beta=0.0,
        beam_width=50,
    )
    logp = make_logits("jeg gik en tur i skoven", vocab).copy()
    # find the frame where the trailing 'n' peaks and make it a near-tie with 's'
    n_id, s_id = vocab.index("n"), vocab.index("s")
    t = len("jeg gik en tur i skove") * 2  # frames alternate token/blank
    logp[t, :] = np.log(1e-6)
    logp[t, n_id] = np.log(0.49)
    logp[t, s_id] = np.log(0.51)
    assert decoder.decode(logp) == "jeg gik en tur i skoven"

    no_lm = BeamSearchDecoder(vocab, blank_id=blank, word_sep_id=sep)
    assert no_lm.decode(logp) == "jeg gik en tur i skoves"


def test_beam_search_batch(acoustic_vocab):
    vocab, blank, sep = acoustic_vocab
    decoder = BeamSearchDecoder(vocab, blank_id=blank, word_sep_id=sep)
    a = make_logits("hej du", vocab)
    b = make_logits("god dag", vocab)
    T = max(len(a), len(b))
    batch = np.full((2, T, len(vocab)), np.log(1e-8), dtype=np.float32)
    batch[0, : len(a)] = a
    batch[1, : len(b)] = b
    out = decoder.decode_batch(batch, lengths=np.array([len(a), len(b)]))
    assert out == ["hej du", "god dag"]


def test_binary_roundtrip(lm, tmp_path):
    """The compact binary format (the build_binary role) loads identically."""
    bin_path = lm.save_binary(tmp_path / "3gram.bin")
    assert bin_path.exists()
    reloaded = NGramModel(bin_path)
    assert reloaded.order == lm.order
    for ctx, word in [("", "jeg"), ("jeg", "gik"), ("gik en", "tur"),
                      ("", "<unk>")]:
        assert reloaded.logprob(word, ctx) == pytest.approx(
            lm.logprob(word, ctx), abs=1e-6
        )
    assert reloaded.sentence_logprob("jeg gik en tur") == pytest.approx(
        lm.sentence_logprob("jeg gik en tur"), abs=1e-5
    )
    # binary is smaller than the ARPA text
    assert bin_path.stat().st_size < lm.arpa_path.stat().st_size


def _parse_arpa(path):
    """ARPA -> {order: {ngram_tuple: (logprob, backoff)}} for comparison."""
    out = {}
    order = 0
    for line in open(path, encoding="utf-8"):
        line = line.rstrip("\n")
        if line.startswith("\\") and "-grams:" in line:
            order = int(line[1])
            out[order] = {}
            continue
        if not line or line.startswith("\\") or order == 0:
            continue
        parts = line.split("\t")
        logprob = float(parts[0])
        words = tuple(parts[1].split(" "))
        backoff = float(parts[2]) if len(parts) > 2 else 0.0
        out[order][words] = (logprob, backoff)
    return out


def test_streamed_training_matches_in_memory(tmp_path):
    """The lmplz-style disk pipeline produces the same ARPA entries as the
    in-memory estimator — with a tiny shard budget, forcing many spills and
    merges (reference pipeline: src/coral/ngram.py:126-143)."""
    rng = __import__("numpy").random.default_rng(3)
    words = ["hej", "med", "dig", "verden", "tak", "for", "i", "dag", "mad"]
    corpus = tmp_path / "corpus.txt"
    with corpus.open("w") as f:
        for _ in range(300):
            n = rng.integers(1, 7)
            f.write(" ".join(rng.choice(words, size=n)) + "\n")

    mem = tmp_path / "mem.arpa"
    disk = tmp_path / "disk.arpa"
    NGramModel.train(corpus, mem, order=3, prune=[0, 1, 1])
    # budget of 100 entries -> dozens of shard spills on this corpus
    NGramModel.train(corpus, disk, order=3, prune=[0, 1, 1], streamed=True,
                     budget_entries=100, scratch_dir=tmp_path)

    a, b = _parse_arpa(mem), _parse_arpa(disk)
    assert set(a) == set(b)
    for order in a:
        assert set(a[order]) == set(b[order]), f"order {order} entries differ"
        for key in a[order]:
            la, ba = a[order][key]
            lb, bb = b[order][key]
            assert abs(la - lb) < 1e-4, (order, key, la, lb)
            assert abs(ba - bb) < 1e-4, (order, key, ba, bb)


def test_streamed_training_no_pruning(tmp_path):
    rng = __import__("numpy").random.default_rng(4)
    words = ["a", "b", "c", "d"]
    corpus = tmp_path / "c.txt"
    with corpus.open("w") as f:
        for _ in range(80):
            n = rng.integers(1, 5)
            f.write(" ".join(rng.choice(words, size=n)) + "\n")
    mem = tmp_path / "m.arpa"
    disk = tmp_path / "d.arpa"
    NGramModel.train(corpus, mem, order=2, prune=[0, 0])
    NGramModel.train(corpus, disk, order=2, prune=[0, 0], streamed=True,
                     budget_entries=64, scratch_dir=tmp_path)
    assert _parse_arpa(mem).keys() == _parse_arpa(disk).keys()
    a, b = _parse_arpa(mem), _parse_arpa(disk)
    for order in a:
        assert a[order].keys() == b[order].keys()


def test_streamed_model_queries_like_in_memory(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("hej med dig\nhej verden\nhej med dig verden\n" * 30)
    mem = NGramModel.train(corpus, tmp_path / "m.arpa", order=3)
    disk = NGramModel.train(corpus, tmp_path / "d.arpa", order=3,
                            streamed=True, budget_entries=64,
                            scratch_dir=tmp_path)
    for sentence in ("hej med dig", "hej verden", "dig med hej"):
        assert abs(
            mem.sentence_logprob(sentence) - disk.sentence_logprob(sentence)
        ) < 1e-4
