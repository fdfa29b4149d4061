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


def test_tar_staging_roundtrip(tmp_path):
    """compress -> stage -> decompress reproduces the audio tree; corrupted
    archives are cleaned up on both ends (reference:
    build_coral_asr.py:773-857)."""
    builder = load_script("build_coral_asr")

    src = tmp_path / "source_audio"
    for sub, names in [("s1", ["a.wav", "b.wav"]), ("s2", ["c.wav"])]:
        d = src / sub
        d.mkdir(parents=True)
        for n in names:
            (d / n).write_bytes(b"RIFF" + bytes(64))

    work = tmp_path / "work"
    work.mkdir()
    staged = builder.stage_audio_directory(src, work)
    assert sorted(p.name for p in staged.iterdir()) == ["s1", "s2"]
    assert (staged / "s1" / "a.wav").read_bytes().startswith(b"RIFF")
    # archives were left next to the source (reusable on the next run)
    assert sorted(p.name for p in src.glob("*.tar.xz")) == [
        "s1.tar.xz", "s2.tar.xz",
    ]

    # corrupted archive: recovery removes the partial dir AND the archive
    bad = src / "s3.tar.xz"
    bad.write_bytes(b"this is not xz data")
    out = builder.decompress_archive(bad, staged)
    assert out is None
    assert not bad.exists()
    assert not (staged / "s3").exists()

    # idempotence: staging again with archives present short-circuits
    staged2 = builder.stage_audio_directory(src, work)
    assert (staged2 / "s2" / "c.wav").exists()


def test_strip_all_suffixes():
    from pathlib import Path

    builder = load_script("build_coral_asr")
    assert builder.strip_all_suffixes(Path("/x/y.tar.xz")) == Path("/x/y")
    assert builder.strip_all_suffixes(Path("/x/y")) == Path("/x/y")


def test_conversation_ab_speaker_resolution(tmp_path):
    """'A'/'B' subtitle names resolve through the Conversations table
    (reference: build_coral_asr.py:525-560)."""
    import sqlite3
    import wave

    builder = load_script("build_coral_asr")

    db = tmp_path / "meta.db"
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE Speakers (id_speaker TEXT, gender TEXT, age INT,"
        " dialect TEXT, birthplace TEXT, country_birth TEXT)"
    )
    con.execute("INSERT INTO Speakers VALUES ('spk1','female',30,'fynsk','O','DK')")
    con.execute("INSERT INTO Speakers VALUES ('spk2','male',40,'jysk','A','DK')")
    con.execute(
        "CREATE TABLE Conversations (id_conversation TEXT,"
        " id_speaker_a TEXT, id_speaker_b TEXT)"
    )
    con.execute("INSERT INTO Conversations VALUES ('conv1', 'spk1', 'spk2')")
    con.commit()
    con.close()

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    sr = 16000
    with wave.open(str(audio_dir / "conv1.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(bytes(2 * sr * 4))  # 4 s of silence

    transcripts = tmp_path / "subs"
    transcripts.mkdir()
    (transcripts / "conv1.ass").write_text(
        "[Events]\n"
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV,"
        " Effect, Text\n"
        "Dialogue: 0,0:00:00.50,0:00:01.50,Default,A,0,0,0,,hej med dig\n"
        "Dialogue: 0,0:00:01.60,0:00:02.60,Default,B,0,0,0,,hej igen\n"
        "Dialogue: 0,0:00:02.70,0:00:03.20,Default,C,0,0,0,,ukendt taler\n"
    )

    examples = builder.build_conversation_dataset(db, audio_dir, transcripts)
    assert [e["id_speaker"] for e in examples] == ["spk1", "spk2"]
    assert examples[0]["gender"] == "female"
    assert examples[1]["dialect"] == "jysk"


def test_nst_reorganise_and_bad_files(tmp_path):
    """The NST reorganise pass moves every archive into the train/test layout
    and the curation pass drops known-bad + tiny files (reference:
    build_nst_da.py:127-229)."""
    nst = load_script("build_nst_da")

    raw = tmp_path / "raw"
    # train_audio/dk/<subdir>/*.wav
    d = raw / "train_audio" / "dk" / "r1"
    d.mkdir(parents=True)
    (d / "good.wav").write_bytes(bytes(10000))
    (d / "tiny.wav").write_bytes(bytes(100))
    (d / "dk11x242-18072000-1149_u0047.wav").write_bytes(bytes(10000))
    # train_metadata
    (raw / "train_metadata").mkdir()
    (raw / "train_metadata" / "x.spl").write_text("")
    # test_and_errors/supplement_dk/testdata/...
    td = raw / "test_and_errors" / "supplement_dk" / "testdata"
    (td / "audio" / "t1").mkdir(parents=True)
    (td / "audio" / "t1" / "t.wav").write_bytes(bytes(9000))
    (td / "metadata").mkdir()
    (td / "metadata" / "m.spl").write_text("")
    (td / "sprakbanken_0611_transform.log").write_text("log")
    (td / "dk_manifest_test.json").write_text("{}")
    (raw / "test_and_errors" / "supplement_dk" /
     "dk_errorfiles_train.json").write_text("{}")
    # metadata_csvs
    (raw / "metadata_csvs").mkdir()
    (raw / "metadata_csvs" / "NST_dk.csv").write_text("filename,text\n")
    (raw / "metadata_csvs" / "supplement_dk.csv").write_text("filename,text\n")
    # readme
    (raw / "readme").mkdir()
    (raw / "readme" / "doc.pdf").write_bytes(b"%PDF")

    nst.reorganise_files(raw)
    assert (raw / "train" / "audio" / "good.wav").exists()
    assert (raw / "test" / "audio" / "t.wav").exists()
    assert (raw / "train" / "metadata.csv").exists()
    assert (raw / "test" / "metadata.csv").exists()
    assert (raw / "train" / "errorfiles.json").exists()
    assert (raw / "test" / "manifest.json").exists()
    assert (raw / "test" / "log.log").exists()
    assert (raw / "README.pdf").exists()
    assert not (raw / "train_audio").exists()

    removed = nst.remove_bad_files(raw)
    assert removed == 2  # the tiny file + the known-bad prefix
    assert (raw / "train" / "audio" / "good.wav").exists()
    assert not (raw / "train" / "audio" / "tiny.wav").exists()
