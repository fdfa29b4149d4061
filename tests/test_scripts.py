"""Tests for the dataset-construction and tooling scripts."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS_DIR = Path(__file__).parent.parent / "scripts"


def load_script(name: str):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS_DIR / f"{name}.py")
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


ALL_SCRIPTS = [p.stem for p in SCRIPTS_DIR.glob("*.py")]


@pytest.mark.parametrize("script", ALL_SCRIPTS)
def test_script_parses(script):
    import ast

    ast.parse((SCRIPTS_DIR / f"{script}.py").read_text(encoding="utf-8"))


def test_ass_parser(tmp_path):
    builder = load_script("build_coral_asr")
    ass = tmp_path / "conv.ass"
    ass.write_text(
        "[Events]\n"
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, "
        "Effect, Text\n"
        "Dialogue: 0,0:00:01.50,0:00:03.25,Default,spe_abc,0,0,0,,hej med dig\n"
        "Dialogue: 0,0:00:04.00,0:00:05.00,Default,spe_abc,0,0,0,,*** anonym\n"
        "Dialogue: 0,0:00:06.00,0:00:07.00,Default,,0,0,0,,uden taler\n",
        encoding="utf-8",
    )
    segments = builder.parse_ass(ass)
    assert len(segments) == 3
    assert segments[0]["start"] == 1.5 and segments[0]["end"] == 3.25
    assert segments[0]["speaker"] == "spe_abc"
    assert segments[0]["text"] == "hej med dig"
    # the bad-segment regex drops anonymised spans
    assert builder.BAD_SEGMENT_RE.search(segments[1]["text"])


def test_speaker_split():
    builder = load_script("build_coral_asr")
    examples = [
        {"id_speaker": f"spk{i % 4}", "text": str(i)} for i in range(12)
    ]
    splits = builder.split_dataset(
        examples, test_speakers=["spk0"], val_speakers=["spk1"]
    )
    assert len(splits["test"]) == 3
    assert len(splits["val"]) == 3
    assert len(splits["train"]) == 6
    assert {e["id_speaker"] for e in splits["train"]} == {"spk2", "spk3"}


def test_ftspeech_transcription_cleanup():
    builder = load_script("build_ftspeech")
    assert builder.preprocess_transcription("hej <UNK> med  dig") == "hej med dig"


def test_split_search_sampler():
    import pandas as pd

    splits = load_script("get_coral_split_ids")
    rng = np.random.default_rng(0)
    genders = ["female", "male"]
    dialects = ["a", "b", "c"]
    speakers = pd.DataFrame(
        {
            "id_speaker": [f"spk{i}" for i in range(60)],
            "gender": [genders[i % 2] for i in range(60)],
            "dialect": [dialects[i % 3] for i in range(60)],
            "age": rng.integers(18, 80, 60),
            "num_samples": rng.integers(50, 200, 60),
            "asr_cer": rng.uniform(0, 0.3, 60),
        }
    )
    candidate = splits.EvalDataset(
        speakers,
        requirements={"gender": 0.4, "dialect": 0.2, "age_group": 0.1},
        banned_speakers={"spk0"},
        min_hours=0.5,
        max_hours=5.0,
        mean_seconds_per_sample=5.0,
        seed=0,
    )
    assert candidate.satisfies_requirements
    assert "spk0" not in candidate.speaker_ids
    assert candidate.difficulty > 0
    # demographic minima hold
    total = len(candidate)
    for counts, req in (
        (candidate.counts["gender"], 0.4),
        (candidate.counts["dialect"], 0.2),
    ):
        for count in counts.values():
            assert count / total >= req


def test_candidate_ranking():
    splits = load_script("get_coral_split_ids")

    class Fake:
        def __init__(self, difficulty, n, var):
            self.difficulty = difficulty
            self._n = n
            self.distribution_variance = var

        def __len__(self):
            return self._n

    best = Fake(difficulty=0.3, n=100, var=0.01)   # hard, small, balanced
    worst = Fake(difficulty=0.05, n=500, var=0.2)
    mid = Fake(difficulty=0.2, n=200, var=0.05)
    ranked = splits.rank_candidates([worst, best, mid])
    assert ranked[0] is best and ranked[-1] is worst


def test_all_root_configs_compose(config_path):
    from coral_tpu.config import compose

    for name in (
        "asr_finetuning", "evaluation", "dataset_validation",
        "dataset_creation", "split_creation", "demo",
    ):
        cfg = compose(name, overrides=[], config_path=config_path)
        assert cfg is not None
