"""Model definitions: wav2vec2-CTC and Whisper seq2seq, as functional flax modules."""

from .wav2vec2 import Wav2Vec2Config, Wav2Vec2ForCTC

__all__ = ["Wav2Vec2Config", "Wav2Vec2ForCTC"]
