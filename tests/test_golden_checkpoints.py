"""Golden-manifest tests for the real published checkpoints.

The round-1 converters were parity-tested only against *randomly configured*
tiny HF models; nothing guaranteed they consume the actual tensor sets of
facebook/wav2vec2-xls-r-300m and openai/whisper-large-v3 (the checkpoints the
reference fine-tunes, reference: ``src/coral/wav2vec2.py:104-126``,
``whisper.py:67-108``). ``tests/golden/*.json`` pin every tensor name + shape
of those architectures (generated offline from their published config.json
values by ``tools/gen_golden_manifests.py``); these tests

1. re-derive the manifests from the installed ``transformers`` and diff them
   against the golden files (drift in HF naming or in our mirrored configs
   surfaces here), and
2. feed a zero-filled state dict with exactly the golden tensor set through
   ``coral_tpu.models.convert`` and require the output pytree to match our
   model's ``init`` shapes leaf-for-leaf at full 300M/1.5B scale.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


def _load(name):
    return json.loads((GOLDEN / name).read_text())


def _zero_state_dict(manifest):
    return {
        name: np.zeros(shape, dtype=np.float32)
        for name, shape in manifest["tensors"].items()
    }


def _shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def test_xlsr_manifest_matches_transformers():
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2ForPreTraining

    golden = _load("wav2vec2-xls-r-300m.json")
    with torch.device("meta"):
        model = Wav2Vec2ForPreTraining(Wav2Vec2Config(**golden["config"]))
    derived = {k: list(v.shape) for k, v in model.state_dict().items()}
    assert derived == golden["tensors"]


def test_whisper_manifest_matches_transformers():
    import torch
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    golden = _load("whisper-large-v3.json")
    with torch.device("meta"):
        model = WhisperForConditionalGeneration(
            WhisperConfig(**golden["config"])
        )
    derived = {k: list(v.shape) for k, v in model.state_dict().items()}
    assert derived == golden["tensors"]


def test_xlsr_checkpoint_converts_to_init_tree():
    from coral_tpu.models import Wav2Vec2Config, Wav2Vec2ForCTC
    from coral_tpu.models.convert import wav2vec2_params_from_torch

    golden = _load("wav2vec2-xls-r-300m.json")
    cfg = Wav2Vec2Config.xls_r_300m(vocab_size=46)
    converted = wav2vec2_params_from_torch(_zero_state_dict(golden), cfg)

    model = Wav2Vec2ForCTC(cfg)
    expected = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 16000)), jnp.asarray([16000]),
        )["params"]
    )
    # The pretraining checkpoint carries no lm_head; everything else must
    # match our init tree leaf-for-leaf.
    assert "lm_head" not in converted
    got = _shapes(converted["wav2vec2"])
    want = _shapes(expected["wav2vec2"])
    assert got == want


def test_whisper_checkpoint_converts_to_init_tree():
    from coral_tpu.models.whisper import WhisperConfig, init_whisper_params
    from coral_tpu.models.convert import whisper_params_from_torch

    golden = _load("whisper-large-v3.json")
    cfg = WhisperConfig.large_v3()
    hf = golden["config"]
    # Our architecture preset must mirror the published config.json.
    assert (cfg.d_model, cfg.encoder_layers, cfg.decoder_layers) == (
        hf["d_model"], hf["encoder_layers"], hf["decoder_layers"],
    )
    assert (cfg.num_mel_bins, cfg.vocab_size) == (
        hf["num_mel_bins"], hf["vocab_size"],
    )
    assert cfg.max_target_positions == hf["max_target_positions"]

    converted = whisper_params_from_torch(_zero_state_dict(golden), cfg)
    expected = jax.eval_shape(
        lambda: init_whisper_params(jax.random.PRNGKey(0), cfg)
    )
    assert _shapes(converted) == _shapes(expected)
