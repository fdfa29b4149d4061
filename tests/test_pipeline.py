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


def test_pipeline_uses_stored_ngram_decoder(trained_model_dir):
    """With an ARPA stored next to the model, the beam+LM path engages."""
    from coral_tpu.decoding import NGramModel
    from coral_tpu.pipeline import ASRPipeline

    corpus = trained_model_dir / "corpus.txt"
    corpus.write_text(
        "\n".join(["hej med dig", "god dag", "jeg gik en tur"] * 3),
        encoding="utf-8",
    )
    NGramModel.train(corpus, trained_model_dir / "3gram.arpa", order=3)

    asr = ASRPipeline(trained_model_dir, batch_size=2)
    rng = np.random.default_rng(1)
    clip = (rng.standard_normal(16_000) * 0.1).astype(np.float32)
    out = asr.transcribe_batch([clip, clip])
    assert len(out) == 2 and all(isinstance(t, str) for t in out)

    # no_lm switches back to greedy decoding
    asr_greedy = ASRPipeline(trained_model_dir, batch_size=2, no_lm=True)
    out2 = asr_greedy.transcribe_batch([clip])
    assert isinstance(out2[0], str)
