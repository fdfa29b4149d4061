"""Tests for the Hydra-compatible config engine."""

import os
from pathlib import Path

import pytest

from coral_tpu.config import compose, to_container


@pytest.fixture()
def cfg(config_path):
    return compose(
        config_name="asr_finetuning",
        overrides=["model=test-wav2vec2", "datasets=test_dataset"],
        config_path=config_path,
    )


class TestCompose:
    def test_model_group_selected(self, cfg) -> None:
        assert cfg.model.name == "test-wav2vec2"
        assert cfg.model.type == "wav2vec2"
        assert cfg.model.freeze_feature_encoder is True
        assert cfg.model.sampling_rate == 16_000

    def test_datasets_multiselect(self, config_path) -> None:
        cfg = compose(
            "asr_finetuning",
            overrides=["datasets=[coral_read_aloud,coral_conversation]"],
            config_path=config_path,
        )
        names = [name for name, _ in cfg.datasets.items()]
        assert names == ["coral_read_aloud", "coral_conversation"]
        assert cfg.datasets.coral_read_aloud.subset == "read_aloud"

    def test_root_values(self, cfg) -> None:
        assert cfg.seed == 4242
        assert cfg.total_batch_size == 256
        assert cfg.min_seconds_per_example == 1.0
        assert cfg.padding == "longest"
        assert cfg.dataset_probabilities is None

    def test_value_overrides(self, config_path) -> None:
        cfg = compose(
            "asr_finetuning",
            overrides=[
                "model=test-whisper",
                "datasets=test_dataset",
                "total_batch_size=2",
                "per_device_batch_size=2",
                "max_steps=2",
                "bf16_allowed=false",
                "save_total_limit=0",
                "enable_experiment_tracking=false",
            ],
            config_path=config_path,
        )
        assert cfg.total_batch_size == 2
        assert cfg.max_steps == 2
        assert cfg.bf16_allowed is False
        assert cfg.enable_experiment_tracking is False
        assert cfg.model.type == "whisper"

    def test_dotted_override(self, config_path) -> None:
        cfg = compose(
            "asr_finetuning",
            overrides=["model=test-wav2vec2", "model.learning_rate=5e-5"],
            config_path=config_path,
        )
        assert cfg.model.learning_rate == 5e-5

    def test_interpolation(self, cfg) -> None:
        assert cfg.model_id.startswith("test-wav2vec2-")
        assert cfg.model_dir == f"models/{cfg.model_id}"
        # experiment_tracking name_run interpolates against the root
        assert cfg.experiment_tracking.name_run == cfg.model_id

    def test_list_override(self, config_path) -> None:
        cfg = compose(
            "asr_finetuning",
            overrides=["dataset_probabilities=[0.8,0.2]"],
            config_path=config_path,
        )
        assert list(cfg.dataset_probabilities) == [0.8, 0.2]

    def test_evaluation_config(self, config_path) -> None:
        cfg = compose("evaluation", config_path=config_path)
        assert cfg.dataset == "CoRal-project/coral-v3::conversation"
        assert cfg.batch_size == 16
        assert cfg.sub_dialect_to_dialect["fynsk"] == "Fynsk"

    def test_to_container(self, cfg) -> None:
        d = to_container(cfg)
        assert isinstance(d, dict)
        assert d["model"]["name"] == "test-wav2vec2"
        assert isinstance(d["model_id"], str) and "${" not in d["model_id"]

    def test_add_override(self, config_path) -> None:
        cfg = compose(
            "asr_finetuning", overrides=["+brand_new_key=7"], config_path=config_path
        )
        assert cfg.brand_new_key == 7

    def test_bare_override_of_unknown_key_raises(self, config_path) -> None:
        # Hydra semantics: a bare key=value may only modify an existing key.
        # Silent creation turns typos (or keys that actually live under a
        # group, e.g. learning_rate vs model.learning_rate) into no-ops that
        # quietly train with the wrong hyperparameters.
        with pytest.raises(KeyError, match=r"\+learning_rate"):
            compose(
                "asr_finetuning", overrides=["learning_rate=1e-3"],
                config_path=config_path,
            )
        # The documented escape hatch still works.
        cfg = compose(
            "asr_finetuning",
            overrides=["model.learning_rate=1e-3", "+learning_rate=1e-3"],
            config_path=config_path,
        )
        assert cfg.model.learning_rate == 1e-3


class TestPlatformEnvHandling:
    """Importing coral_tpu.config translates an explicit non-axon
    JAX_PLATFORMS into the config flag (the axon site overrides the env var
    at interpreter start), but must never re-apply the ambient "axon" value —
    an in-process jax.config.update (tests, dryrun children) has to win."""

    def _run(self, env_value):
        import subprocess
        import sys

        code = (
            "import os, jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"  # explicit update
            "import coral_tpu.config\n"
            "print(jax.config.jax_platforms)\n"
        )
        env = dict(os.environ, JAX_PLATFORMS=env_value)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            env=env, cwd=str(Path(__file__).parent.parent), timeout=120,
        )
        assert out.returncode == 0, out.stderr
        return out.stdout.strip().splitlines()[-1]

    def test_ambient_axon_value_never_reapplied(self):
        assert self._run("axon") == "cpu"

    def test_explicit_cpu_env_is_honored(self):
        assert self._run("cpu") == "cpu"
