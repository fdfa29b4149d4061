"""Build the FTSpeech dataset from the raw release.

Semantic rebuild of the reference's builder (reference:
``src/scripts/build_ftspeech.py``): read the per-split TSV transcripts, clean
the transcriptions, slice the long parliamentary recordings into utterances
along the TSV start/end times, and save an arrow dataset. Slicing uses
soundfile/wave + numpy (no pydub)::

    python scripts/build_ftspeech.py --input-dir data/ftspeech \
        --output-dir data/ftspeech-arrow
"""

import argparse
import logging
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

logger = logging.getLogger("ftspeech_builder")

SPLIT_TSVS = {
    "train": "ft-speech_train.tsv",
    "dev_balanced": "ft-speech_dev-balanced.tsv",
    "dev_other": "ft-speech_dev-other.tsv",
    "test_balanced": "ft-speech_test-balanced.tsv",
    "test_other": "ft-speech_test-other.tsv",
}


def preprocess_transcription(text: str) -> str:
    """FTSpeech-specific cleanup (reference: build_ftspeech.py:117-137):
    strip the <UNK> token and normalise whitespace."""
    text = text.replace("<UNK>", " ")
    return re.sub(r" +", " ", text).strip()


def read_audio_segment(path: Path, start_s: float, end_s: float) -> tuple:
    import soundfile as sf

    with sf.SoundFile(path) as f:
        sr = f.samplerate
        f.seek(int(start_s * sr))
        frames = int((end_s - start_s) * sr)
        audio = f.read(frames, dtype="float32", always_2d=True).mean(axis=1)
    return audio, sr


def build_split(input_dir: Path, tsv_name: str) -> list[dict]:
    import csv

    tsv_path = input_dir / "text" / tsv_name
    if not tsv_path.exists():
        logger.warning(f"Missing transcript file {tsv_path}; skipping split.")
        return []
    rows = []
    with tsv_path.open("r", encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t")
        for row in reader:
            utterance_id = row["utterance_id"]
            # id layout: {speaker}_{recording-date-id}_{start}_{end} (10 ms units)
            parts = utterance_id.split("_")
            speaker = parts[0]
            recording = "_".join(parts[1:-2])
            start_s = int(parts[-2]) / 100
            end_s = int(parts[-1]) / 100
            audio_path = input_dir / "audio" / f"{recording}.wav"
            if not audio_path.exists():
                continue
            audio, sr = read_audio_segment(audio_path, start_s, end_s)
            rows.append(
                {
                    "utterance_id": utterance_id,
                    "speaker_id": speaker,
                    "audio": {"array": audio, "sampling_rate": sr},
                    "sentence": preprocess_transcription(row["transcript"]),
                }
            )
    logger.info(f"{tsv_name}: built {len(rows):,} utterances")
    return rows


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-dir", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args()

    import datasets as hfds

    splits = {
        name: hfds.Dataset.from_list(rows)
        for name, tsv in SPLIT_TSVS.items()
        if (rows := build_split(args.input_dir, tsv))
    }
    hfds.DatasetDict(splits).save_to_disk(str(args.output_dir))
    logger.info(f"Saved FTSpeech to {args.output_dir}")


if __name__ == "__main__":
    main()
