"""The benched stack IS the shipped stack.

bench.py's headline number is measured on an explicitly-constructed model
config; these tests pin that construction to what the production surface
(`scripts/finetune_asr_model.py model=wav2vec2-small`, reference:
``src/scripts/finetune_asr_model.py:36-78``) composes by default, so the
headline throughput is what a user actually gets. If a bench-side flag flip
isn't adopted as a default (or vice versa), this fails.
"""

import dataclasses

import jax.numpy as jnp
import pytest

from coral_tpu.config import compose
from coral_tpu.models import Wav2Vec2Config
from coral_tpu.training.model_setup import Wav2Vec2Setup


@pytest.fixture(scope="module")
def setup(config_path, tmp_path_factory):
    model_dir = tmp_path_factory.mktemp("bench_defaults_model")
    config = compose(
        "asr_finetuning",
        overrides=[
            "model=wav2vec2-small",
            "datasets=[synthetic]",
            f"model_dir={model_dir}",
        ],
        config_path=config_path,
    )
    return Wav2Vec2Setup(config)


def bench_model_config(vocab_size: int) -> Wav2Vec2Config:
    """The exact model-config construction bench.py measures."""
    return Wav2Vec2Config.xls_r_300m(
        vocab_size=vocab_size, dtype=jnp.bfloat16, attention_impl="pallas",
        attention_save_stats="v3",
        attention_fused_qkv_bias=True,
        fused_ffn=True, fused_ffn_ln=True, fused_ffn_block=True,
        fused_ffn_block_dg=True,
        pos_conv_fold=True,
    )


def test_default_model_config_matches_bench(setup) -> None:
    benched = bench_model_config(setup.tokenizer.vocab_size)
    shipped = setup.model_config
    # Dropouts/SpecAugment differ by design (bench uses the arch defaults,
    # production composes the reference YAML hyperparameters); everything
    # that selects a compute path must match field-for-field.
    for field in dataclasses.fields(Wav2Vec2Config):
        if field.name in (
            "hidden_dropout", "activation_dropout", "attention_dropout",
            "feat_proj_dropout", "final_dropout", "layerdrop",
            "mask_time_prob", "mask_time_length", "mask_feature_prob",
            "mask_feature_length",
        ):
            continue
        assert getattr(shipped, field.name) == getattr(benched, field.name), (
            f"Default-composed {field.name}="
            f"{getattr(shipped, field.name)!r} differs from bench.py's "
            f"{getattr(benched, field.name)!r} — adopt the benched value as "
            "the production default or re-bench."
        )


def test_default_trainer_flags_match_bench(setup) -> None:
    # bench.py: remat_policy="save_qk_ctx", remat_feature_encoder=False,
    # grad_dtype="bfloat16", mu_dtype="bfloat16".
    assert setup.model.remat_policy == "save_qk_ctx"
    assert setup.model.remat_feature_encoder is False
    assert setup.config.get("grad_dtype", "bfloat16") == "bfloat16"
    assert setup.config.get("adam_mu_dtype", "bfloat16") == "bfloat16"


def test_fused_ffn_opt_outs(config_path, tmp_path) -> None:
    def make(*extra):
        config = compose(
            "asr_finetuning",
            overrides=[
                "model=wav2vec2-small",
                "datasets=[synthetic]",
                f"model_dir={tmp_path}",
                *extra,
            ],
            config_path=config_path,
        )
        return Wav2Vec2Setup(config).model_config

    off = make("+model.fused_ffn=false")
    assert off.fused_ffn is False and off.fused_ffn_ln is False

    no_ln = make("+model.fused_ffn_ln=false")
    assert no_ln.fused_ffn is True and no_ln.fused_ffn_ln is False

    no_fold = make("+model.pos_conv_fold=false")
    assert no_fold.pos_conv_fold is False

    no_block = make("+model.fused_ffn_block=false")
    assert no_block.fused_ffn_block is False and no_block.fused_ffn is True


def test_whisper_defaults_match_bench(config_path, tmp_path) -> None:
    """Whisper defaults = the measured round-4 winning stack (fused FFN w/
    LN fold on, xla train-path LNs, bf16 grad buffers), matching bench.py's
    whisper construction."""
    from coral_tpu.training.model_setup import WhisperSetup

    config = compose(
        "asr_finetuning",
        overrides=[
            "model=whisper-small",
            "datasets=[synthetic]",
            f"model_dir={tmp_path}",
        ],
        config_path=config_path,
    )
    setup = WhisperSetup(config)
    assert setup.model_config.fused_ffn is True
    assert setup.model_config.fused_ffn_ln is True
    assert setup.model_config.fused_ffn_block is True
    assert setup.model_config.fused_ffn_block_dg is True
    assert setup.model_config.ln_impl == "xla"
    assert setup.config.get("grad_dtype", "bfloat16") == "bfloat16"

    off = compose(
        "asr_finetuning",
        overrides=[
            "model=whisper-small",
            "datasets=[synthetic]",
            f"model_dir={tmp_path}",
            "+model.fused_ffn=false",
        ],
        config_path=config_path,
    )
    off_cfg = WhisperSetup(off).model_config
    assert off_cfg.fused_ffn is False and off_cfg.fused_ffn_ln is False
