"""Generate golden checkpoint manifests for the published models.

Builds the exact HF architectures the reference fine-tunes —
facebook/wav2vec2-xls-r-300m (reference: ``config/model/wav2vec2-small.yaml``)
and openai/whisper-large-v3 (``config/model/whisper-large.yaml``) — on the
torch ``meta`` device (shape-only, no downloads) from their published
``config.json`` hyperparameters, and writes ``tests/golden/<model>.json``
with every state-dict tensor's name and shape.

The checked-in manifests let ``tests/test_golden_checkpoints.py`` verify that
``coral_tpu.models.convert`` consumes a *real* checkpoint's full tensor set
and produces exactly our model's parameter tree, without any network access.

Run: ``python tools/gen_golden_manifests.py``
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = Path(__file__).parent.parent
GOLDEN = REPO / "tests" / "golden"

# Hyperparameters from the published config.json files (values mirrored here
# because the image has no network egress).
XLS_R_300M = {
    # https://huggingface.co/facebook/wav2vec2-xls-r-300m/blob/main/config.json
    "vocab_size": 32,
    "hidden_size": 1024,
    "num_hidden_layers": 24,
    "num_attention_heads": 16,
    "intermediate_size": 4096,
    "conv_dim": [512] * 7,
    "conv_stride": [5, 2, 2, 2, 2, 2, 2],
    "conv_kernel": [10, 3, 3, 3, 3, 2, 2],
    "conv_bias": True,
    "num_conv_pos_embeddings": 128,
    "num_conv_pos_embedding_groups": 16,
    "do_stable_layer_norm": True,
    "feat_extract_norm": "layer",
    "num_codevector_groups": 2,
    "num_codevectors_per_group": 320,
    "codevector_dim": 768,
    "proj_codevector_dim": 768,
}

WHISPER_LARGE_V3 = {
    # https://huggingface.co/openai/whisper-large-v3/blob/main/config.json
    "vocab_size": 51866,
    "d_model": 1280,
    "encoder_layers": 32,
    "decoder_layers": 32,
    "encoder_attention_heads": 20,
    "decoder_attention_heads": 20,
    "encoder_ffn_dim": 5120,
    "decoder_ffn_dim": 5120,
    "num_mel_bins": 128,
    "max_source_positions": 1500,
    "max_target_positions": 448,
}


def manifest(model) -> dict[str, list[int]]:
    return {
        name: list(tensor.shape)
        for name, tensor in sorted(model.state_dict().items())
    }


def main() -> None:
    import torch
    from transformers import (
        Wav2Vec2Config,
        Wav2Vec2ForPreTraining,
        WhisperConfig,
        WhisperForConditionalGeneration,
    )

    GOLDEN.mkdir(parents=True, exist_ok=True)

    with torch.device("meta"):
        w2v = Wav2Vec2ForPreTraining(Wav2Vec2Config(**XLS_R_300M))
    out = {
        "model_id": "facebook/wav2vec2-xls-r-300m",
        "architecture": "Wav2Vec2ForPreTraining",
        "config": XLS_R_300M,
        "tensors": manifest(w2v),
    }
    (GOLDEN / "wav2vec2-xls-r-300m.json").write_text(
        json.dumps(out, indent=1, sort_keys=True)
    )
    print(f"wav2vec2-xls-r-300m: {len(out['tensors'])} tensors")

    with torch.device("meta"):
        wh = WhisperForConditionalGeneration(WhisperConfig(**WHISPER_LARGE_V3))
    out = {
        "model_id": "openai/whisper-large-v3",
        "architecture": "WhisperForConditionalGeneration",
        "config": WHISPER_LARGE_V3,
        "tensors": manifest(wh),
    }
    (GOLDEN / "whisper-large-v3.json").write_text(
        json.dumps(out, indent=1, sort_keys=True)
    )
    print(f"whisper-large-v3: {len(out['tensors'])} tensors")


if __name__ == "__main__":
    main()
