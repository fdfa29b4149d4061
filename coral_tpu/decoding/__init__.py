"""Native decoding stack: n-gram LM + CTC beam search (C++ via ctypes).

Replaces the reference's external KenLM + pyctcdecode dependencies (reference:
``src/coral/ngram.py``, ``src/coral/compute_metrics.py:53-54``) with in-repo C++
(``coral_tpu/native/ngram.cc``, ``ctc_beam.cc``) compiled on demand with the
system toolchain and loaded through ctypes — pybind11 is deliberately avoided.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from functools import lru_cache
from pathlib import Path

import numpy as np

logger = logging.getLogger(__package__)

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_NAME = "libcoral_decoder.so"

__all__ = ["NGramModel", "BeamSearchDecoder", "build_native_library"]


def build_native_library(force: bool = False) -> Path:
    """Compile the decoder shared library if needed; returns its path."""
    lib_path = _NATIVE_DIR / _LIB_NAME
    sources = sorted(_NATIVE_DIR.glob("*.cc"))
    if (
        not force
        and lib_path.exists()
        and all(lib_path.stat().st_mtime >= s.stat().st_mtime for s in sources)
    ):
        return lib_path
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        *[str(s) for s in sources], "-o", str(lib_path),
    ]
    logger.info(f"Building native decoder: {' '.join(cmd)}")
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib_path


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(str(build_native_library()))
    lib.coral_ngram_train.restype = ctypes.c_int
    lib.coral_ngram_train.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
    ]
    lib.coral_ngram_train_streamed.restype = ctypes.c_int
    lib.coral_ngram_train_streamed.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ctypes.c_uint64, ctypes.c_char_p,
    ]
    lib.coral_ngram_load.restype = ctypes.c_void_p
    lib.coral_ngram_load.argtypes = [ctypes.c_char_p]
    lib.coral_ngram_load_any.restype = ctypes.c_void_p
    lib.coral_ngram_load_any.argtypes = [ctypes.c_char_p]
    lib.coral_ngram_save_binary.restype = ctypes.c_int
    lib.coral_ngram_save_binary.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.coral_ngram_free.argtypes = [ctypes.c_void_p]
    lib.coral_ngram_order.restype = ctypes.c_int
    lib.coral_ngram_order.argtypes = [ctypes.c_void_p]
    lib.coral_ngram_logprob.restype = ctypes.c_float
    lib.coral_ngram_logprob.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.coral_ngram_sentence_logprob.restype = ctypes.c_float
    lib.coral_ngram_sentence_logprob.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
    ]
    lib.coral_ctc_beam_search.restype = ctypes.c_void_p  # char*, freed manually
    lib.coral_ctc_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_char_p, ctypes.c_float, ctypes.c_char_p, ctypes.c_float,
    ]
    lib.coral_free.argtypes = [ctypes.c_void_p]
    return lib


class NGramModel:
    """A Kneser-Ney n-gram LM: train to ARPA, load, query.

    The training semantics mirror ``lmplz -o N --prune 0 1 1...`` as the
    reference invokes it (reference: ``src/coral/ngram.py:126-143``), and the
    ARPA file includes a proper ``</s>`` unigram, so the reference's post-hoc
    header surgery (``ngram.py:149-169``) is unnecessary.
    """

    def __init__(self, arpa_path: str | Path) -> None:
        self.arpa_path = Path(arpa_path)
        # Accepts either format: ARPA text or the compact binary (magic-sniffed).
        self._handle = _lib().coral_ngram_load_any(str(arpa_path).encode())
        if not self._handle:
            raise FileNotFoundError(f"Could not load LM: {arpa_path}")
        self.order = _lib().coral_ngram_order(self._handle)

    @classmethod
    def train(
        cls,
        corpus_path: str | Path,
        arpa_path: str | Path,
        order: int = 3,
        prune: list[int] | None = None,
        streamed: bool = False,
        budget_entries: int = 20_000_000,
        scratch_dir: str | Path | None = None,
    ) -> "NGramModel":
        """Estimate the LM from a one-sentence-per-line corpus file.

        Args:
            streamed: Use the lmplz-style disk pipeline: counts spill to
                sorted shards under ``scratch_dir`` whenever the in-memory
                map reaches ``budget_entries``, so corpus size does not bound
                memory (reference: ``src/coral/ngram.py:126-143``). Produces
                the same ARPA entries as the in-memory path.
        """
        if prune is None:
            prune = [0] + [1] * (order - 1)  # reference default (ngram.py:127)
        arr = (ctypes.c_uint64 * len(prune))(*prune)
        if streamed:
            rc = _lib().coral_ngram_train_streamed(
                str(corpus_path).encode(), str(arpa_path).encode(), order,
                arr, len(prune), budget_entries,
                str(scratch_dir).encode() if scratch_dir else None,
            )
        else:
            rc = _lib().coral_ngram_train(
                str(corpus_path).encode(), str(arpa_path).encode(), order,
                arr, len(prune),
            )
        if rc != 0:
            raise RuntimeError(f"n-gram training failed with code {rc}")
        return cls(arpa_path)

    def save_binary(self, path: str | Path) -> Path:
        """Serialise to the compact binary format (the reference's
        ``build_binary`` step, reference: ``src/coral/ngram.py:361-384``)."""
        rc = _lib().coral_ngram_save_binary(self._handle, str(path).encode())
        if rc != 0:
            raise RuntimeError(f"binary serialisation failed with code {rc}")
        return Path(path)

    def logprob(self, word: str, context: str = "") -> float:
        """log10 P(word | context words)."""
        return _lib().coral_ngram_logprob(
            self._handle, context.encode(), word.encode()
        )

    def sentence_logprob(self, sentence: str) -> float:
        """log10 P(<s> sentence </s>)."""
        return _lib().coral_ngram_sentence_logprob(
            self._handle, sentence.encode()
        )

    def __del__(self) -> None:
        if getattr(self, "_handle", None):
            _lib().coral_ngram_free(self._handle)
            self._handle = None


class BeamSearchDecoder:
    """CTC beam search with pyctcdecode-parity n-gram shallow fusion.

    Equivalent to the reference's pyctcdecode decoder built by
    ``build_ctcdecoder`` (reference: ``src/coral/ngram.py:341-343``). All
    defaults match pyctcdecode's: alpha/beta fusion weights, beam width 100,
    per-frame token floor ``token_min_logp=-5``, beam pruning at
    ``beam_prune_logp=-10`` below the best fused score, ``score_boundary``
    (<s>/</s> sentence-boundary scoring), and — when ``unigrams`` are given —
    mid-beam partial-word penalties from the unigram prefix set
    (``unk_score_offset`` per unknown prefix, length-scaled past 6 chars).
    The reference ships its decoder *without* unigrams, in which case the
    partial-word penalty is identically zero there as well.
    """

    def __init__(
        self,
        vocab: list[str],
        blank_id: int,
        word_sep_id: int,
        lm: NGramModel | None = None,
        alpha: float = 0.5,
        beta: float = 1.5,
        beam_width: int = 100,
        score_boundary: bool = True,
        beam_prune_logp: float = -10.0,
        token_min_logp: float = -5.0,
        unigrams: list[str] | None = None,
        unk_score_offset: float = -10.0,
        hotwords: list[str] | None = None,
        hotword_weight: float = 10.0,
    ) -> None:
        self.vocab = list(vocab)
        self._vocab_c = (ctypes.c_char_p * len(vocab))(
            *[t.encode() for t in vocab]
        )
        self.blank_id = blank_id
        self.word_sep_id = word_sep_id
        self.lm = lm
        self.alpha = alpha
        self.beta = beta
        self.beam_width = beam_width
        self.score_boundary = score_boundary
        self.beam_prune_logp = beam_prune_logp
        self.token_min_logp = token_min_logp
        self._unigrams_c = (
            "\n".join(unigrams).encode() if unigrams else None
        )
        self.unk_score_offset = unk_score_offset
        self._hotwords_c = (
            "\n".join(hotwords).encode() if hotwords else None
        )
        self.hotword_weight = hotword_weight

    def decode(self, log_probs: np.ndarray) -> str:
        """Decode one utterance.

        Args:
            log_probs: (T, V) natural-log probabilities (e.g. jax log_softmax
                output fetched to host).

        Returns:
            The decoded transcript.
        """
        log_probs = np.ascontiguousarray(log_probs, dtype=np.float32)
        T, V = log_probs.shape
        assert V == len(self._vocab_c), f"vocab size mismatch: {V}"
        ptr = _lib().coral_ctc_beam_search(
            log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            T, V, self._vocab_c, self.blank_id, self.word_sep_id,
            self.beam_width,
            self.lm._handle if self.lm is not None else None,
            self.alpha, self.beta,
            self.lm.order if self.lm is not None else 0,
            1 if self.score_boundary else 0,
            self.beam_prune_logp, self.token_min_logp,
            self._unigrams_c, self.unk_score_offset,
            self._hotwords_c, self.hotword_weight,
        )
        try:
            return ctypes.string_at(ptr).decode("utf-8", errors="replace")
        finally:
            _lib().coral_free(ptr)

    def decode_batch(
        self, log_probs: np.ndarray, lengths: np.ndarray | None = None
    ) -> list[str]:
        """Decode a (B, T, V) batch, trimming each row to its valid length."""
        out = []
        for i in range(log_probs.shape[0]):
            row = log_probs[i]
            if lengths is not None:
                row = row[: int(lengths[i])]
            out.append(self.decode(row))
        return out
