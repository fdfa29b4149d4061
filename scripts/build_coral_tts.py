"""Build the CoRal TTS dataset from filename-encoded recordings.

Semantic rebuild of the reference's builder (reference:
``src/scripts/build_coral_tts.py``): recording filenames encode speaker and
transcription ids; transcripts live in a sidecar file; audio is 44.1 kHz::

    python scripts/build_coral_tts.py --input-dir data/tts-raw \
        --output-dir data/coral-tts
"""

import argparse
import logging
from pathlib import Path

logger = logging.getLogger("coral_tts_builder")


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-dir", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--sampling-rate", type=int, default=44_100)
    args = parser.parse_args()

    import datasets as hfds

    # transcripts: "id<TAB>text" lines in transcripts.txt
    transcript_files = list(args.input_dir.rglob("transcript*.txt"))
    transcripts: dict[str, str] = {}
    for tf in transcript_files:
        for line in tf.read_text(encoding="utf-8",
                                 errors="replace").splitlines():
            key, _, text = line.partition("\t")
            if key.strip() and text.strip():
                transcripts[key.strip()] = text.strip()

    rows = []
    for wav in sorted(args.input_dir.rglob("*.wav")):
        # filename layout: {speaker_id}_{transcription_id}.wav
        stem_parts = wav.stem.split("_", 1)
        if len(stem_parts) != 2:
            continue
        speaker_id, transcription_id = stem_parts
        text = transcripts.get(transcription_id) or transcripts.get(wav.stem)
        if not text:
            continue
        rows.append(
            {
                "audio": str(wav),
                "text": text,
                "speaker_id": speaker_id,
                "transcription_id": transcription_id,
            }
        )
    logger.info(f"Built {len(rows):,} TTS examples.")

    ds = hfds.Dataset.from_list(rows).cast_column(
        "audio", hfds.Audio(sampling_rate=args.sampling_rate)
    )
    ds.save_to_disk(str(args.output_dir))
    logger.info(f"Saved CoRal TTS to {args.output_dir}")


if __name__ == "__main__":
    main()
