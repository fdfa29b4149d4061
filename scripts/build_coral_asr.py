"""Build the CoRal ASR dataset from raw recordings + the metadata database.

Semantic rebuild of the reference's dataset builder (reference:
``src/scripts/build_coral_asr.py``): join the SQLite metadata, build the
read-aloud subset from per-utterance recordings, build the conversation subset
by slicing long recordings along their .ass subtitle segments, bootstrap-validate
with an ASR model, split train/val/test by speaker id, and upload with retry.
External-tool differences: the .ass subtitles are parsed natively (no pysubs2)
and audio slicing goes through soundfile/wave + numpy (no pydub/ffmpeg)::

    python scripts/build_coral_asr.py audio_dir=/data/raw \
        metadata_database_path=/data/raw/CoRal_public.db hub_id=org/coral
"""

import logging
import re
import sqlite3
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from coral_tpu.config import compose

logger = logging.getLogger("coral_builder")

# Segments dropped by the conversation builder (reference: build_coral_asr.py
# drops ``***`` anonymised spans, bracketed noise tags, and unknown speakers).
BAD_SEGMENT_RE = re.compile(r"\*\*\*|\[[^\]]*\]")

READ_ALOUD_QUERY = """
SELECT
    Recordings.id_recording,
    Recordings.filename,
    Sentences.text,
    Speakers.id_speaker,
    Speakers.gender,
    Speakers.age,
    Speakers.dialect,
    Speakers.birthplace,
    Speakers.country_birth
FROM Recordings
JOIN Sentences ON Recordings.id_sentence = Sentences.id_sentence
JOIN Speakers ON Recordings.id_speaker = Speakers.id_speaker
"""


def read_audio(path: Path) -> tuple[np.ndarray, int]:
    """Decode audio to mono float32 (soundfile when available, else WAV)."""
    try:
        import soundfile as sf

        audio, sr = sf.read(path, dtype="float32", always_2d=True)
        return audio.mean(axis=1), sr
    except ImportError:
        import wave

        with wave.open(str(path), "rb") as w:
            sr = w.getframerate()
            raw = np.frombuffer(
                w.readframes(w.getnframes()), dtype=np.int16
            ).astype(np.float32) / 32768.0
            return raw.reshape(-1, w.getnchannels()).mean(axis=1), sr


def parse_ass_timestamp(stamp: str) -> float:
    """'H:MM:SS.cc' -> seconds."""
    hours, minutes, seconds = stamp.strip().split(":")
    return int(hours) * 3600 + int(minutes) * 60 + float(seconds)


def parse_ass(path: Path) -> list[dict]:
    """Minimal .ass subtitle parser: Dialogue lines -> segments.

    Returns dicts with ``start``, ``end`` (seconds), ``speaker``, ``text``.
    """
    segments = []
    fields: list[str] = []
    for line in path.read_text(encoding="utf-8-sig",
                               errors="replace").splitlines():
        if line.startswith("Format:"):
            fields = [f.strip().lower() for f in line[7:].split(",")]
        elif line.startswith("Dialogue:"):
            parts = line[9:].split(",", len(fields) - 1)
            row = dict(zip(fields, parts))
            segments.append(
                {
                    "start": parse_ass_timestamp(row.get("start", "0:00:00.00")),
                    "end": parse_ass_timestamp(row.get("end", "0:00:00.00")),
                    "speaker": (row.get("name") or row.get("actor") or "").strip(),
                    "text": row.get("text", "").replace("\\N", " ").strip(),
                }
            )
    return segments


def strip_all_suffixes(path: Path) -> Path:
    """Drop every suffix — ``x.tar.xz`` -> ``x`` (reference:
    ``build_coral_asr.py:860-873``)."""
    while path.suffix:
        path = path.with_suffix("")
    return path


def compress_directory(directory: Path) -> Path:
    """tar.xz a directory next to itself, skipping existing archives
    (reference: ``build_coral_asr.py:815-829``)."""
    import tarfile

    archive = directory.with_suffix(".tar.xz")
    if not archive.exists():
        with tarfile.open(archive, mode="w:xz") as tar:
            tar.add(directory, arcname=directory.name)
    return archive


def decompress_archive(archive: Path, destination_dir: Path) -> Path | None:
    """Copy + extract a ``.tar.xz`` into ``destination_dir``.

    Corrupted archives are cleaned up on both ends (partial extraction AND the
    source archive, so the next run re-compresses it), mirroring the
    reference's recovery path (``build_coral_asr.py:832-857``). Returns the
    extracted directory, or None when the archive was corrupt.
    """
    import shutil
    import tarfile

    staged = destination_dir / archive.name
    extracted = strip_all_suffixes(staged)
    if extracted.exists():
        return extracted
    if not staged.exists():
        shutil.copy(archive, destination_dir)
    try:
        with tarfile.open(staged, mode="r:xz") as tar:
            tar.extractall(destination_dir)
    except Exception as error:
        logger.error(f"Corrupted archive {archive}: {error}")
        shutil.rmtree(extracted, ignore_errors=True)
        archive.unlink(missing_ok=True)
        staged.unlink(missing_ok=True)
        return None
    staged.unlink()
    return extracted


def stage_audio_directory(audio_dir: Path, work_dir: Path | None = None) -> Path:
    """Stage a remote/slow audio tree into a local working directory.

    The reference compresses each audio subdirectory on the source disk, moves
    the archives, and decompresses locally — one big sequential read instead
    of millions of small ones (``build_coral_asr.py:773-813``). Threads
    overlap the compression of independent subdirectories.
    """
    from concurrent.futures import ThreadPoolExecutor

    work_dir = Path(work_dir) if work_dir else Path.cwd()
    staged_dir = work_dir / audio_dir.name
    staged_dir.mkdir(parents=True, exist_ok=True)

    subdirs = [p for p in audio_dir.iterdir() if p.is_dir()]
    if not subdirs:
        return staged_dir

    with ThreadPoolExecutor() as pool:
        list(pool.map(compress_directory, subdirs))
    archives = sorted(audio_dir.glob("*.tar.xz"))
    with ThreadPoolExecutor() as pool:
        list(pool.map(
            lambda a: decompress_archive(a, staged_dir), archives
        ))
    return staged_dir


def load_conversation_speaker_map(
    metadata_database_path: Path,
) -> dict[str, tuple[str, str]]:
    """id_conversation -> (speaker A id, speaker B id), when the metadata
    database carries a Conversations table (reference joins it at
    ``build_coral_asr.py:360-398``)."""
    con = sqlite3.connect(metadata_database_path)
    con.row_factory = sqlite3.Row
    try:
        rows = con.execute(
            "SELECT id_conversation, id_speaker_a, id_speaker_b "
            "FROM Conversations"
        ).fetchall()
    except sqlite3.OperationalError:
        return {}
    finally:
        con.close()
    return {
        str(r["id_conversation"]): (str(r["id_speaker_a"]),
                                    str(r["id_speaker_b"]))
        for r in rows
    }


def build_read_aloud_dataset(metadata_database_path: Path,
                             audio_dir: Path) -> list[dict]:
    """One example per recording, joined with sentence + speaker metadata."""
    con = sqlite3.connect(metadata_database_path)
    con.row_factory = sqlite3.Row
    examples = []
    missing = 0
    for row in con.execute(READ_ALOUD_QUERY):
        candidates = list(audio_dir.rglob(f"{Path(row['filename']).stem}.*"))
        if not candidates:
            missing += 1
            continue
        audio, sr = read_audio(candidates[0])
        examples.append(
            {
                "id_recording": row["id_recording"],
                "audio": {"array": audio, "sampling_rate": sr},
                "text": row["text"],
                "id_speaker": row["id_speaker"],
                "gender": row["gender"],
                "age": row["age"],
                "dialect": row["dialect"],
                "birthplace": row["birthplace"],
                "country_birth": row["country_birth"],
            }
        )
    con.close()
    if missing:
        logger.warning(f"{missing:,} read-aloud recordings had no audio file.")
    logger.info(f"Built {len(examples):,} read-aloud examples.")
    return examples


def build_conversation_dataset(
    metadata_database_path: Path, audio_dir: Path, transcript_dir: Path
) -> list[dict]:
    """Slice conversation recordings along their .ass subtitle segments."""
    con = sqlite3.connect(metadata_database_path)
    con.row_factory = sqlite3.Row
    speakers = {
        row["id_speaker"]: dict(row)
        for row in con.execute("SELECT * FROM Speakers")
    }
    con.close()
    ab_speakers = load_conversation_speaker_map(metadata_database_path)

    examples = []
    for subtitle_file in sorted(transcript_dir.rglob("*.ass")):
        stem = subtitle_file.stem
        audio_files = [
            p for suffix in (".wav", ".flac", ".m4a")
            for p in audio_dir.rglob(f"{stem}{suffix}")
        ]
        if not audio_files:
            logger.warning(f"No audio for transcript {subtitle_file.name}")
            continue
        audio, sr = read_audio(audio_files[0])
        for i, seg in enumerate(parse_ass(subtitle_file)):
            text = seg["text"]
            # Drop anonymised/noise segments and unknown speakers (reference
            # drops ***/bracket tags and speakerless segments,
            # build_coral_asr.py:541-552).
            if not text or BAD_SEGMENT_RE.search(text):
                continue
            tag = seg["speaker"].upper()
            if tag in ("A", "B"):
                # Conversation subtitles name speakers "A"/"B"; resolve via
                # the Conversations metadata (reference: only A/B segments
                # are kept and mapped to the conversation's speaker rows).
                pair = ab_speakers.get(stem)
                if pair is None:
                    continue
                speaker_id = pair[0] if tag == "A" else pair[1]
            elif stem in ab_speakers or not seg["speaker"]:
                # In a mapped conversation any other tag is an unknown
                # speaker (reference drops it, build_coral_asr.py:551-552).
                continue
            else:
                # Trees without a Conversations table carry speaker ids
                # directly in the subtitle Name field.
                speaker_id = seg["speaker"]
            start = int(seg["start"] * sr)
            end = min(int(seg["end"] * sr), len(audio))
            if end <= start:
                continue
            meta = speakers.get(speaker_id, {})
            examples.append(
                {
                    "id_recording": f"{stem}_{i:05d}",
                    "audio": {"array": audio[start:end], "sampling_rate": sr},
                    "text": text,
                    "id_speaker": speaker_id,
                    "gender": meta.get("gender"),
                    "age": meta.get("age"),
                    "dialect": meta.get("dialect"),
                    "birthplace": meta.get("birthplace"),
                    "country_birth": meta.get("country_birth"),
                }
            )
    logger.info(f"Built {len(examples):,} conversation examples.")
    return examples


def split_dataset(
    examples: list[dict], test_speakers: list[str], val_speakers: list[str]
) -> dict[str, list[dict]]:
    """Speaker-disjoint 3-way split (reference: build_coral_asr.py:602-705)."""
    test_set = set(test_speakers or [])
    val_set = set(val_speakers or [])
    splits: dict[str, list[dict]] = {"train": [], "val": [], "test": []}
    for example in examples:
        speaker = example.get("id_speaker")
        if speaker in test_set:
            splits["test"].append(example)
        elif speaker in val_set:
            splits["val"].append(example)
        else:
            splits["train"].append(example)
    for name, rows in splits.items():
        logger.info(f"{name}: {len(rows):,} examples")
    return splits


def upload_dataset(splits_by_subset: dict[str, dict[str, list[dict]]],
                   hub_id: str, max_retries: int = 60) -> None:
    """Upload with the reference's 60 x 1-minute retry loop."""
    import datasets as hfds

    for subset, splits in splits_by_subset.items():
        ds = hfds.DatasetDict(
            {
                name: hfds.Dataset.from_list(rows)
                for name, rows in splits.items()
                if rows
            }
        )
        for attempt in range(max_retries):
            try:
                ds.push_to_hub(hub_id, config_name=subset)
                break
            except Exception as error:
                logger.warning(
                    f"Upload failed (attempt {attempt + 1}): {error}; "
                    "retrying in 60 s."
                )
                time.sleep(60)


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    config = compose(
        "dataset_creation",
        overrides=sys.argv[1:],
        config_path=Path(__file__).parent.parent / "config",
    )
    audio_dir = Path(config.audio_dir)
    db_path = Path(config.metadata_database_path)

    read_aloud = build_read_aloud_dataset(db_path, audio_dir / "recordings")
    conversation = build_conversation_dataset(
        db_path, audio_dir / "conversations", audio_dir / "transcriptions"
    )

    if config.get("validation") and config.validation.get("model_id"):
        from coral_tpu.config import DictConfig
        from coral_tpu.data.validation import add_validations
        from coral_tpu.evaluation.evaluate import load_saved_predictor

        val_cfg = config.validation
        predictor, _ = load_saved_predictor(
            DictConfig(
                {
                    "model_id": val_cfg.model_id,
                    "sampling_rate": val_cfg.sampling_rate,
                    "characters_to_keep": val_cfg.characters_to_keep,
                    "lower_case": val_cfg.lower_case,
                    "batch_size": val_cfg.batch_size,
                    "cache_dir": config.get("cache_dir"),
                    "max_seconds_per_example":
                        config.get("max_seconds_per_example", 10),
                }
            )
        )
        read_aloud = list(
            add_validations(
                read_aloud,
                predictor=predictor,
                model_id=val_cfg.model_id,
                lower_case=val_cfg.lower_case,
                sampling_rate=val_cfg.sampling_rate,
                characters_to_keep=val_cfg.characters_to_keep,
                batch_size=val_cfg.batch_size,
                max_cer=val_cfg.max_cer,
            )
        )

    splits_by_subset = {
        "read_aloud": split_dataset(
            read_aloud, config.get("test_speakers"), config.get("val_speakers")
        ),
        "conversation": split_dataset(
            conversation, config.get("test_speakers"),
            config.get("val_speakers"),
        ),
    }
    if config.get("hub_id"):
        upload_dataset(splits_by_subset, config.hub_id)


if __name__ == "__main__":
    main()
