"""n-gram decoder training pipeline: corpus construction -> LM -> stored decoder.

Native rebuild of the reference's KenLM pipeline (reference:
``src/coral/ngram.py:26-384``): build a cleaned, deduplicated sentence corpus
from the decoder datasets (Danish Wikipedia + Reddit), excise any sentence that
contains a CoRal test-split sentence, estimate a pruned modified-Kneser-Ney
n-gram LM (C++, ``coral_tpu/native/ngram.cc``), and store it next to the model
for beam-search shallow fusion. The reference's runtime KenLM download +
cmake build (``ngram.py:42-93``) and its ARPA ``</s>`` header surgery
(``ngram.py:149-169``) have no equivalent here — the native trainer ships in
the repo and emits a well-formed ``</s>`` unigram directly.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path
from typing import Any, Iterable

from ..text.normalization import clean_transcription
from . import NGramModel

logger = logging.getLogger(__package__)


def is_main_process() -> bool:
    return os.getenv("RANK", "0") == "0"


def train_and_store_ngram_model(config: Any) -> Path | None:
    """Train the n-gram LM for a fine-tuned model (reference: ``ngram.py:26``).

    Rank-0 only, like the reference (``ngram.py:33-35``). Returns the ARPA path.
    """
    if not is_main_process():
        return None

    num_ngrams = int(config.model.get("decoder_num_ngrams", 3))
    model_dir = Path(config.model_dir)
    arpa_path = model_dir / f"{num_ngrams}gram.arpa"
    if arpa_path.exists():
        logger.info(f"n-gram model already exists at {arpa_path}")
        return arpa_path

    corpus_path = get_sentence_corpus_path(config)
    logger.info("Training n-gram language model...")
    prune = [0] + [1] * (num_ngrams - 1)  # lmplz-compatible (ngram.py:127)
    # Large corpora go through the lmplz-style disk pipeline (sorted count
    # shards; bounded memory) — the same trade lmplz itself makes (reference:
    # ngram.py:126-143). Small corpora stay fully in memory.
    streamed = corpus_path.stat().st_size > 512 * 1024 * 1024
    if streamed:
        logger.info("Corpus exceeds 512 MiB; using disk-streamed estimation.")
    lm = NGramModel.train(
        corpus_path, arpa_path, order=num_ngrams, prune=prune,
        streamed=streamed, scratch_dir=model_dir,
    )
    # Compact binary alongside the ARPA (the reference's build_binary step,
    # ngram.py:361-384); the decoder loads either.
    lm.save_binary(arpa_path.with_suffix(".bin"))
    logger.info(f"Trained n-gram language model stored at {arpa_path}")
    return arpa_path


def get_sentence_corpus_path(config: Any) -> Path:
    """Build (or reuse) the decoder sentence corpus (reference: ``ngram.py:179``).

    Pipeline: load each decoder dataset -> clean text through the same
    normalisation as the acoustic labels -> concatenate -> deduplicate ->
    remove any occurrence of a CoRal test-split sentence -> write one sentence
    per line.
    """
    cache_dir = Path(config.get("cache_dir") or (Path.home() / ".cache"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    dataset_hash = hashlib.md5(
        ",".join(sorted(config.decoder_datasets.keys())).encode("utf-8")
    ).hexdigest()
    sentence_path = cache_dir / f"ngram-sentences-{dataset_hash}.txt"
    if sentence_path.exists():
        logger.info(f"Loading existing sentence corpus from {sentence_path}")
        return sentence_path

    sentences: list[str] = []
    for name, ds_cfg in config.decoder_datasets.items():
        logger.info(f"Loading decoder dataset {name!r}...")
        for text in _iter_texts(ds_cfg, cache_dir):
            cleaned = clean_transcription(
                text,
                characters_to_keep=config.model.characters_to_keep,
                lower_case=config.model.lower_case,
                convert_numerals=False,
            )
            if cleaned:
                sentences.append(cleaned)
        logger.info(f"{name}: corpus now holds {len(sentences):,} sentences")

    # Deduplicate (required for Kneser-Ney estimation; reference ngram.py:262)
    before = len(sentences)
    sentences = list(dict.fromkeys(sentences))
    logger.info(f"Removed {before - len(sentences):,} duplicate sentences")

    # Excise CoRal test-split sentences (reference ngram.py:265-313)
    eval_sentences = _load_test_split_sentences(config, cache_dir)
    if eval_sentences:
        changed = 0
        cleaned_sentences = []
        for sentence in sentences:
            hit = False
            for eval_sentence in eval_sentences:
                if eval_sentence and eval_sentence in sentence:
                    sentence = sentence.replace(eval_sentence, "")
                    hit = True
            changed += hit
            cleaned_sentences.append(sentence)
        sentences = cleaned_sentences
        logger.info(f"Removed evaluation sentences from {changed:,} examples")

    sentence_path.write_text("\n".join(sentences), encoding="utf-8")
    return sentence_path


def _iter_texts(ds_cfg: Any, cache_dir: Path) -> Iterable[str]:
    """Stream the text column of one decoder dataset (or a synthetic stand-in)."""
    dataset_id = ds_cfg["id"]
    text_col = ds_cfg.get("text_column", "text")
    if dataset_id.startswith("synthetic://"):
        from ..data.synthetic import make_synthetic_examples

        n = int(dataset_id.split("://")[1])
        for ex in make_synthetic_examples(n=n, seed=0):
            yield ex["text"]
        return

    import datasets as hfds

    ds = hfds.load_dataset(
        path=dataset_id,
        name=ds_cfg.get("subset"),
        split=ds_cfg.get("split", "train"),
        streaming=True,
        cache_dir=str(cache_dir),
        token=os.getenv("HUGGINGFACE_HUB_TOKEN", True),
    )
    for row in ds:
        yield row[text_col]


def _load_test_split_sentences(config: Any, cache_dir: Path) -> set[str]:
    """CoRal test-split sentences that must not leak into the LM corpus."""
    excision_dataset = config.get(
        "decoder_excision_dataset", "CoRal-project/coral-v3::read_aloud"
    )
    if not excision_dataset:
        return set()
    from ..config import DictConfig
    from ..data.loading import load_dataset_for_evaluation

    eval_config = DictConfig(
        {
            "dataset": excision_dataset,
            "cache_dir": str(cache_dir),
            "eval_split_name": "test",
            "text_column": "text",
            "audio_column": "audio",
            "sampling_rate": 16_000,
            "min_seconds_per_example": 0.0,
            "max_seconds_per_example": 1e6,
            "lower_case": config.model.lower_case,
            "characters_to_keep": config.model.characters_to_keep,
        }
    )
    try:
        return {row["text"] for row in load_dataset_for_evaluation(eval_config)()}
    except Exception as error:  # zero-egress / dataset unavailable
        logger.warning(
            f"Could not load the test split for sentence excision: {error}"
        )
        return set()
