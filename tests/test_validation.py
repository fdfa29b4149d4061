"""Dataset-QA (bootstrap validation) and aux-subsystem tests."""

import numpy as np
import pytest

from coral_tpu.data.synthetic import make_synthetic_examples
from coral_tpu.data.validation import add_validations


def test_add_validations_keeps_good_drops_bad():
    examples = make_synthetic_examples(n=8, seed=0)
    processed_texts = [e["text"].lower().strip() for e in examples]

    calls = {"i": 0}

    def predictor(batch):
        # Echo the true transcription for even rows; garbage for odd rows.
        out = []
        for _ in range(batch["input_values"].shape[0]):
            i = calls["i"]
            if i < len(processed_texts):
                out.append(
                    processed_texts[i] if i % 2 == 0 else "helt forkert tekst xyz"
                )
            else:
                out.append("")
            calls["i"] += 1
        return out

    kept = list(
        add_validations(
            examples,
            predictor=predictor,
            model_id="test-model",
            batch_size=4,
            max_cer=0.3,
            characters_to_keep="abcdefghijklmnopqrstuvwxyzæøå ",
            max_pad_seconds=6.0,
        )
    )
    # Even rows echo perfectly -> CER 0 -> kept; odd rows are garbage -> dropped.
    assert len(kept) == 4
    for row in kept:
        assert row["asr_cer"] == 0.0
        assert row["asr_validation_model"] == "test-model"
        assert row["asr_prediction"] == row["asr_label"]


def test_noise_bank_from_npy(tmp_path):
    from coral_tpu.audio.noise_bank import load_noise_bank

    bank = np.random.default_rng(0).standard_normal((4, 8000)).astype(np.float32)
    np.save(tmp_path / "bank.npy", bank)
    loaded = load_noise_bank(tmp_path / "bank.npy")
    np.testing.assert_array_equal(loaded, bank)
    assert load_noise_bank(None) is None
    assert load_noise_bank(tmp_path / "missing.npy") is None


def test_tracking_factory_degrades_gracefully():
    from coral_tpu.config import DictConfig
    from coral_tpu.tracking import NoOpSetup, load_tracking_setup

    config = DictConfig(
        {
            "enable_experiment_tracking": True,
            "experiment_tracking": {"type": "wandb", "name_experiment": "x"},
            "model_id": "m",
        }
    )
    # wandb is not installed in this image -> NoOp fallback.
    setup = load_tracking_setup(config)
    assert isinstance(setup, NoOpSetup)
    setup.run_initialization()
    setup.log_metrics({"loss": 1.0}, step=1)
    setup.run_finalization()

    config.enable_experiment_tracking = False
    assert isinstance(load_tracking_setup(config), NoOpSetup)

    config.enable_experiment_tracking = True
    config.experiment_tracking = {"type": "bogus"}
    with pytest.raises(ValueError):
        load_tracking_setup(config)


def test_monkeypatched_and_disable_tqdm():
    from coral_tpu.utils import disable_tqdm, monkeypatched

    class Obj:
        attr = 1

    with monkeypatched(Obj, "attr", 2):
        assert Obj.attr == 2
    assert Obj.attr == 1

    with disable_tqdm():
        pass  # no tqdm installed or patched cleanly — must not raise
