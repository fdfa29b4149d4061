"""Pure-Python oracle for the pyctcdecode-parity CTC beam search.

An independent reimplementation of the algorithm specified by pyctcdecode's
``BeamSearchDecoderCTC`` (the decoder the reference uses through
``Wav2Vec2ProcessorWithLM``, reference: ``src/coral/ngram.py:341-353``,
``src/coral/compute_metrics.py:53-54``), used to cross-validate the C++
implementation in ``coral_tpu/native/ctc_beam.cc``:

- beams keyed by (completed text, partial word, last char), acoustic scores
  merged by log-sum-exp;
- per-frame candidates: tokens with log p >= token_min_logp plus the argmax;
- fused per-frame ranking: logit + completed-word LM + partial-word score
  (hotword-prefix proration when the partial prefixes a hotword, else the
  unigram unk penalty);
- score_boundary <s>/</s> handling through pyctcdecode's per-text LM cache
  (</s> skipped for final texts already scored mid-beam; finalisation
  entries cache it), finalisation merge by (text, trailing word);
- pyctcdecode pruning defaults.

Shares nothing with the C++ code except the n-gram LM queries.
"""

from __future__ import annotations

import math


def _logadd(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    hi, lo = max(a, b), min(a, b)
    return hi + math.log1p(math.exp(lo - hi))


def _context(text: str, order: int, score_boundary: bool) -> str:
    words = (["<s>"] if score_boundary else []) + text.split()
    return " ".join(words[-(order - 1):]) if order > 1 else ""


def _partial_penalty(part, unigrams, unk_offset):
    if not part or unigrams is None:
        return 0.0
    known = any(u.startswith(part) for u in unigrams)
    if known:
        return 0.0
    penalty = unk_offset
    if len(part) > 6:
        penalty *= len(part) / 6.0
    return penalty


def _partial_score(part, unigrams, unk_offset, hotwords, hotword_weight):
    """Hotword-prefix proration takes over from the LM partial penalty
    (pyctcdecode HotwordScorer.score_partial_token)."""
    if part and hotwords:
        lens = [len(h) for h in hotwords if h.startswith(part)]
        if lens:
            return hotword_weight * len(part) / min(lens)
    return _partial_penalty(part, unigrams, unk_offset)


def oracle_decode(
    log_probs,
    vocab,
    blank_id,
    word_sep_id,
    lm=None,
    alpha=0.5,
    beta=1.5,
    beam_width=100,
    score_boundary=True,
    beam_prune_logp=-10.0,
    token_min_logp=-5.0,
    unigrams=None,
    unk_score_offset=-10.0,
    hotwords=None,
    hotword_weight=10.0,
) -> str:
    """Decode one (T, V) natural-log-probability matrix; returns the text."""
    ln10 = math.log(10.0)
    order = lm.order if lm is not None else 3
    hotset = set(hotwords) if hotwords else None

    def score_word(text: str, word: str) -> float:
        out = 0.0
        if lm is not None:
            ctx = _context(text, order, score_boundary)
            out += alpha * lm.logprob(word, ctx) * ln10 + beta
        if hotset and word in hotset:
            out += hotword_weight
        return out

    # (text, part, last_char) -> [logit_score, lm_score]
    beams = {("", "", -1): [0.0, 0.0]}
    # pyctcdecode's per-text LM cache: text -> whether the entry includes
    # </s> (mid-beam entries never do; finalisation entries always do).
    cache_has_eos = {"": False}

    for frame in log_probs:
        arg_max = int(max(range(len(frame)), key=lambda v: frame[v]))
        candidates = [
            v for v in range(len(frame))
            if frame[v] >= token_min_logp or v == arg_max
        ]
        nxt: dict = {}

        def add(key, logit, lm_score):
            cur = nxt.get(key)
            if cur is None:
                nxt[key] = [logit, lm_score]
            else:
                cur[0] = _logadd(cur[0], logit)

        for (text, part, last), (logit, lms) in beams.items():
            for v in candidates:
                p = float(frame[v])
                if v == blank_id:
                    add((text, part, -1), logit + p, lms)
                elif v == last:
                    add((text, part, v), logit + p, lms)
                elif v == word_sep_id:
                    if part:
                        new_text = f"{text} {part}".strip()
                        cache_has_eos.setdefault(new_text, False)
                        add((new_text, "", v), logit + p,
                            lms + score_word(text, part))
                    else:
                        add((text, "", v), logit + p, lms)
                else:
                    add((text, part + vocab[v], v), logit + p, lms)

        def fused(item):
            (text, part, last), (logit, lms) = item
            return logit + lms + _partial_score(
                part, unigrams, unk_score_offset, hotset, hotword_weight
            )

        ranked = sorted(nxt.items(), key=fused, reverse=True)
        cutoff = fused(ranked[0]) + beam_prune_logp
        ranked = [it for it in ranked if fused(it) >= cutoff][:beam_width]
        beams = dict(ranked)

    # Finalise. First pyctcdecode's `_merge_beams`: drop last_char, merge
    # same-(text, part) beams by log-sum-exp (LM scores are path-independent,
    # hence equal), keeping first-occurrence order — the LM cache below is
    # order-sensitive.
    merged: dict = {}
    for (text, part, _last), (logit, lms) in beams.items():
        cur = merged.get((text, part))
        if cur is None:
            merged[(text, part)] = [logit, lms]
        else:
            cur[0] = _logadd(cur[0], logit)

    # Trailing partial word, then </s> through the LM cache: skipped when the
    # final text was already scored mid-beam; otherwise added and cached with
    # </s>, visible to later beams sharing the text.
    final = []
    for (text, part), (logit, lms) in merged.items():
        new_text = f"{text} {part}".strip() if part else text
        if new_text in cache_has_eos:
            add_eos = cache_has_eos[new_text]
        else:
            add_eos = True
            cache_has_eos[new_text] = True
        if part:
            lms += score_word(text, part)
        if add_eos and lm is not None and score_boundary:
            ctx = _context(new_text, order, score_boundary)
            lms += alpha * lm.logprob("</s>", ctx) * ln10
        final.append((logit + lms, new_text))
    final.sort(reverse=True)
    return final[0][1] if final else ""
