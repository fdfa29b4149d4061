"""End-to-end fine-tuning smoke tests on the virtual 8-device CPU mesh.

Mirrors the reference's integration test, which runs the whole ``finetune()``
(data streaming -> 2 train steps -> eval -> save) on CPU
(reference: ``tests/test_finetune.py:8-10``) — but additionally exercises the
sharded multi-device path and checkpoint resume, which the reference never tested
(SURVEY.md section 4).
"""

import numpy as np
import pytest

from coral_tpu.config import compose
from coral_tpu.training.finetune import finetune

BASE_OVERRIDES = [
    "model=test-wav2vec2",
    "datasets=[synthetic]",
    "+model.architecture=tiny",
    "evaluation_datasets=[{id: synthetic://8, val_name: val}]",
    # A 2-device submesh: full 8-device sharding is covered by the cheap
    # test_train_step suite; 8 virtual devices make this e2e test crawl on a
    # single host core.
    "mesh=[2,1]",
    "total_batch_size=8",
    "per_device_batch_size=2",
    "warmup_steps=2",
    "eval_steps=2",
    "save_steps=2",
    "logging_steps=1",
    "save_total_limit=2",
    "enable_experiment_tracking=false",
    "bf16_allowed=false",
    "gradient_checkpointing=false",
    "max_seconds_per_example=5.0",
    "num_length_buckets=1",
    "+max_label_length=48",
    "+eval_max_samples=8",
    "model.freeze_feature_encoder=true",
]


def make_config(config_path, model_dir, extra=()):
    return compose(
        "asr_finetuning",
        overrides=BASE_OVERRIDES + [f"model_dir={model_dir}", *extra],
        config_path=config_path,
    )


@pytest.mark.slow
def test_finetune_end_to_end_and_resume(tmp_path, config_path):
    model_dir = tmp_path / "model"
    config = make_config(config_path, model_dir, extra=["max_steps=3"])
    history = finetune(config)

    assert np.isfinite(history["loss"])
    assert 0.0 <= history["val_8_cer"] <= 1.0
    assert 0.0 <= history["val_8_wer"] <= 1.0
    assert (model_dir / "vocab.json").exists()
    assert (model_dir / "model").is_dir()
    assert (model_dir / "config.yaml").exists()
    assert (model_dir / "checkpoints").is_dir()

    # Resume from the step-3 checkpoint and continue to step 4 (the compiled
    # programs are shared with the first run via the in-process jit cache).
    config = make_config(
        config_path, model_dir,
        extra=["max_steps=4", "resume_from_checkpoint=true"],
    )
    history = finetune(config)
    assert np.isfinite(history["loss"])


@pytest.mark.slow
def test_finetune_whisper_end_to_end(tmp_path, config_path):
    """The whisper seq2seq path: mel frontend -> encoder-decoder -> generate."""
    from coral_tpu.config import compose as _compose

    config = _compose(
        "asr_finetuning",
        overrides=[
            "model=test-whisper",
            "datasets=[synthetic]",
            "+model.architecture=tiny_test",
            "+model.chunk_seconds=5.0",
            "model.max_length=12",
            "evaluation_datasets=[{id: synthetic://8, val_name: val}]",
            "mesh=[2,1]",
            "total_batch_size=8",
            "per_device_batch_size=2",
            "warmup_steps=2",
            "max_steps=2",
            "eval_steps=2",
            "save_steps=2",
            "logging_steps=1",
            "save_total_limit=1",
            "enable_experiment_tracking=false",
            "bf16_allowed=false",
            "gradient_checkpointing=false",
            "max_seconds_per_example=5.0",
            "+max_label_length=48",
            "+eval_max_samples=8",
            "profile_step=1",  # exercise the xprof trace hook
            "profile_num_steps=1",
            f"model_dir={tmp_path}/model",
        ],
        config_path=config_path,
    )
    history = finetune(config)
    assert np.isfinite(history["loss"])
    assert 0.0 <= history["val_8_cer"] <= 1.0
    assert (tmp_path / "model" / "model").is_dir()
    assert (tmp_path / "model" / "profile").is_dir()  # trace hook fired
