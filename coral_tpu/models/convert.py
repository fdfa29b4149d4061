"""HF torch checkpoint -> coral_tpu flax parameter conversion.

Lets the framework fine-tune the same published checkpoints the reference uses
(facebook/wav2vec2-xls-r-*, openai/whisper-*; reference:
``config/model/*.yaml`` ``pretrained_model_id``). Accepts a torch ``state_dict``
(or a safetensors file) and produces the matching flax param pytree, stacking
per-layer tensors along a leading axis for the scanned encoder and folding torch
weight-norm parametrizations into plain kernels.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np

from .wav2vec2 import Wav2Vec2Config


def _np(t) -> np.ndarray:
    """torch tensor (or ndarray) -> float32 numpy array."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _fold_weight_norm(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Fold torch weight-norm (g, v) into a single conv kernel.

    Supports both the modern parametrization keys (original0/original1) and the
    legacy weight_g/weight_v pair. Returns the torch-layout kernel
    (C_out, C_in/groups, K).
    """
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    elif f"{prefix}.weight_g" in sd:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    else:
        return _np(sd[f"{prefix}.weight"])
    # weight_norm(dim=2): norm over dims (0, 1), broadcast over the kernel axis.
    norm = np.sqrt(np.sum(v**2, axis=(0, 1), keepdims=True))
    return g * v / norm


def _dense(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _layer_norm(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _stack(trees: list[dict]) -> dict:
    """Stack a list of identical pytrees along a new leading (layer) axis."""
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def wav2vec2_params_from_torch(
    state_dict: Mapping[str, Any], config: Wav2Vec2Config
) -> dict:
    """Convert an HF ``Wav2Vec2ForCTC`` state_dict to coral_tpu flax params."""
    sd = state_dict
    params: dict = {"wav2vec2": {}}
    w2v: dict = params["wav2vec2"]

    # Feature encoder convs
    fe: dict = {}
    for i in range(len(config.conv_dim)):
        p = f"wav2vec2.feature_extractor.conv_layers.{i}"
        layer: dict = {
            "conv_kernel": _np(sd[f"{p}.conv.weight"]).transpose(2, 1, 0)
        }
        if f"{p}.conv.bias" in sd:
            layer["conv_bias"] = _np(sd[f"{p}.conv.bias"])
        if f"{p}.layer_norm.weight" in sd:
            norm_name = (
                "layer_norm" if config.feat_extract_norm == "layer" else "group_norm"
            )
            layer[norm_name] = _layer_norm(sd, f"{p}.layer_norm")
        fe[f"conv_layers_{i}"] = layer
    w2v["feature_extractor"] = fe

    w2v["feature_projection"] = {
        "layer_norm": _layer_norm(sd, "wav2vec2.feature_projection.layer_norm"),
        "projection": _dense(sd, "wav2vec2.feature_projection.projection"),
    }

    if "wav2vec2.masked_spec_embed" in sd:
        w2v["masked_spec_embed"] = _np(sd["wav2vec2.masked_spec_embed"])

    # Encoder: positional conv (fold weight norm), final LN, scanned layers.
    pos_kernel = _fold_weight_norm(sd, "wav2vec2.encoder.pos_conv_embed.conv")
    encoder: dict = {
        "pos_conv_embed": {
            "conv_kernel": pos_kernel.transpose(2, 1, 0),
            "conv_bias": _np(sd["wav2vec2.encoder.pos_conv_embed.conv.bias"]),
        },
        "layer_norm": _layer_norm(sd, "wav2vec2.encoder.layer_norm"),
    }

    layers = []
    for i in range(config.num_hidden_layers):
        p = f"wav2vec2.encoder.layers.{i}"
        layers.append(
            {
                "attention": {
                    "q_proj": _dense(sd, f"{p}.attention.q_proj"),
                    "k_proj": _dense(sd, f"{p}.attention.k_proj"),
                    "v_proj": _dense(sd, f"{p}.attention.v_proj"),
                    "out_proj": _dense(sd, f"{p}.attention.out_proj"),
                },
                "layer_norm": _layer_norm(sd, f"{p}.layer_norm"),
                "final_layer_norm": _layer_norm(sd, f"{p}.final_layer_norm"),
                "feed_forward": {
                    "intermediate_dense": _dense(
                        sd, f"{p}.feed_forward.intermediate_dense"
                    ),
                    "output_dense": _dense(sd, f"{p}.feed_forward.output_dense"),
                },
            }
        )
    encoder["layers"] = _stack(layers)
    w2v["encoder"] = encoder

    if "lm_head.weight" in sd:
        params["lm_head"] = _dense(sd, "lm_head")

    return params


def load_torch_state_dict(path: str | Path) -> dict:
    """Load a state dict from a .safetensors or torch .bin checkpoint file."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(str(path))
    import torch

    return torch.load(str(path), map_location="cpu", weights_only=True)


def whisper_params_from_torch(state_dict: Mapping[str, Any], config) -> dict:
    """Convert an HF ``WhisperForConditionalGeneration`` state_dict to our params.

    Per-layer tensors are stacked along a leading (L,) axis for the scanned
    encoder/decoder (``coral_tpu.models.whisper``).
    """
    sd = state_dict

    def attn(prefix: str) -> dict:
        out = {
            "q_proj": _dense(sd, f"{prefix}.q_proj"),
            "k_proj": {"kernel": _np(sd[f"{prefix}.k_proj.weight"]).T},
            "v_proj": _dense(sd, f"{prefix}.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.out_proj"),
        }
        return out

    def enc_layer(i: int) -> dict:
        p = f"model.encoder.layers.{i}"
        return {
            "self_attn": attn(f"{p}.self_attn"),
            "self_attn_layer_norm": _layer_norm(sd, f"{p}.self_attn_layer_norm"),
            "fc1": _dense(sd, f"{p}.fc1"),
            "fc2": _dense(sd, f"{p}.fc2"),
            "final_layer_norm": _layer_norm(sd, f"{p}.final_layer_norm"),
        }

    def dec_layer(i: int) -> dict:
        p = f"model.decoder.layers.{i}"
        return {
            "self_attn": attn(f"{p}.self_attn"),
            "self_attn_layer_norm": _layer_norm(sd, f"{p}.self_attn_layer_norm"),
            "encoder_attn": attn(f"{p}.encoder_attn"),
            "encoder_attn_layer_norm": _layer_norm(
                sd, f"{p}.encoder_attn_layer_norm"
            ),
            "fc1": _dense(sd, f"{p}.fc1"),
            "fc2": _dense(sd, f"{p}.fc2"),
            "final_layer_norm": _layer_norm(sd, f"{p}.final_layer_norm"),
        }

    return {
        "encoder": {
            # torch Conv1d weight (C_out, C_in, K) -> (K, C_in, C_out)
            "conv1": {
                "kernel": _np(sd["model.encoder.conv1.weight"]).transpose(2, 1, 0),
                "bias": _np(sd["model.encoder.conv1.bias"]),
            },
            "conv2": {
                "kernel": _np(sd["model.encoder.conv2.weight"]).transpose(2, 1, 0),
                "bias": _np(sd["model.encoder.conv2.bias"]),
            },
            "embed_positions": _np(sd["model.encoder.embed_positions.weight"]),
            "layers": _stack([enc_layer(i) for i in range(config.encoder_layers)]),
            "layer_norm": _layer_norm(sd, "model.encoder.layer_norm"),
        },
        "decoder": {
            "embed_tokens": _np(sd["model.decoder.embed_tokens.weight"]),
            "embed_positions": _np(sd["model.decoder.embed_positions.weight"]),
            "layers": _stack([dec_layer(i) for i in range(config.decoder_layers)]),
            "layer_norm": _layer_norm(sd, "model.decoder.layer_norm"),
        },
    }
