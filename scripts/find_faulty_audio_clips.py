"""Scan a directory tree for audio files that fail to decode.

Rebuild of the reference's integrity scanner (reference:
``src/scripts/find_faulty_audio_clips.py:39-45``), without the librosa
dependency — decoding goes through soundfile when available, else the stdlib
``wave`` module for WAV files::

    python scripts/find_faulty_audio_clips.py --audio-dir data/raw
"""

import argparse
import logging
from pathlib import Path

logger = logging.getLogger("coral_audio_scan")

AUDIO_SUFFIXES = (".wav", ".flac", ".ogg", ".mp3", ".m4a")


def can_decode(path: Path) -> bool:
    try:
        import soundfile as sf

        with sf.SoundFile(path) as f:
            return f.frames > 0
    except ImportError:
        pass
    except Exception:
        return False
    if path.suffix.lower() != ".wav":
        logger.debug(f"No decoder available for {path.suffix}; skipping {path}")
        return True
    import wave

    try:
        with wave.open(str(path), "rb") as w:
            return w.getnframes() > 0
    except Exception:
        return False


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--audio-dir", type=Path, required=True)
    parser.add_argument("--output", type=Path, default=Path("faulty_clips.txt"))
    args = parser.parse_args()

    faulty = []
    scanned = 0
    for path in sorted(args.audio_dir.rglob("*")):
        if path.suffix.lower() not in AUDIO_SUFFIXES:
            continue
        scanned += 1
        if not can_decode(path):
            logger.warning(f"Faulty audio clip: {path}")
            faulty.append(str(path))
    args.output.write_text("\n".join(faulty), encoding="utf-8")
    logger.info(
        f"Scanned {scanned:,} clips; {len(faulty):,} faulty "
        f"(list written to {args.output})."
    )


if __name__ == "__main__":
    main()
