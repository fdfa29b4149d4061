"""ASRPipeline tests: load a trained model dir, transcribe arrays and batches."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory, config_path):
    """A tiny model trained for 1 step, saved in the deployable layout."""
    from coral_tpu.config import compose
    from coral_tpu.training.finetune import finetune

    model_dir = tmp_path_factory.mktemp("pipe") / "model"
    config = compose(
        "asr_finetuning",
        overrides=[
            "model=test-wav2vec2", "datasets=[synthetic]",
            "+model.architecture=tiny", "evaluation_datasets=[]",
            "mesh=[2,1]", "total_batch_size=8", "per_device_batch_size=2",
            "warmup_steps=1", "max_steps=1", "eval_steps=5", "save_steps=5",
            "logging_steps=1", "save_total_limit=1",
            "enable_experiment_tracking=false", "bf16_allowed=false",
            "gradient_checkpointing=false", "max_seconds_per_example=5.0",
            "num_length_buckets=1", "+max_label_length=48",
            "model.freeze_feature_encoder=true", f"model_dir={model_dir}",
        ],
        config_path=config_path,
    )
    finetune(config)
    return model_dir


def test_pipeline_transcribes_arrays_and_batches(trained_model_dir):
    from coral_tpu.pipeline import ASRPipeline

    asr = ASRPipeline(trained_model_dir, batch_size=4)
    rng = np.random.default_rng(0)
    clip = (rng.standard_normal(16_000) * 0.1).astype(np.float32)

    text = asr(clip)
    assert isinstance(text, str)

    batch = asr.transcribe_batch([clip, clip * 0.5, clip * 0.1])
    assert len(batch) == 3 and all(isinstance(t, str) for t in batch)

    # HF-style audio dict with resampling
    text2 = asr.transcribe({"array": clip, "sampling_rate": 8_000})
    assert isinstance(text2, str)

    # long-form input (> model window) goes through chunking
    long_clip = np.tile(clip, 40)  # 40 s > 30 s window... window is
    # max_seconds from the saved config (5 s here), so this is long-form.
    text3 = asr.transcribe(long_clip)
    assert isinstance(text3, str)

    # streaming interface
    outputs = list(asr.transcribe_stream([clip] * 5))
    assert len(outputs) == 5
