"""Download and build the Nota lyd-og-tekst Danish speech dataset.

Semantic rebuild of the reference's builder (reference:
``src/scripts/build_nota.py``): crawl the Sprogteknologi file listing, download
the zip archives, pair audio with transcripts, and assemble an HF dataset::

    python scripts/build_nota.py --output-dir data/nota
"""

import argparse
import logging
import zipfile
from pathlib import Path

logger = logging.getLogger("nota_builder")

BASE_URL = "https://sprogtek-ressources.digst.govcloud.dk/nota/"


def download_archives(target_dir: Path) -> list[Path]:
    try:
        import httpx

        listing = httpx.get(BASE_URL, follow_redirects=True, timeout=60).text
        import re

        names = sorted(set(re.findall(r'href="([^"]+\.zip)"', listing)))
        archives = []
        for name in names:
            path = target_dir / Path(name).name
            if not path.exists():
                logger.info(f"Downloading {name}...")
                with httpx.stream(
                    "GET", BASE_URL + name, follow_redirects=True, timeout=60
                ) as r:
                    r.raise_for_status()
                    with path.open("wb") as f:
                        for chunk in r.iter_bytes():
                            f.write(chunk)
            archives.append(path)
        return archives
    except Exception as error:
        logger.error(f"Could not crawl {BASE_URL}: {error}")
        return []


def build_dataset(raw_dir: Path) -> "datasets.Dataset":  # noqa: F821
    """Pair each audio file with its same-stem .txt transcript."""
    import datasets as hfds

    rows = []
    for txt in sorted(raw_dir.rglob("*.txt")):
        audio_candidates = [
            p for suffix in (".wav", ".mp3", ".flac")
            if (p := txt.with_suffix(suffix)).exists()
        ]
        if not audio_candidates:
            continue
        text = txt.read_text(encoding="utf-8", errors="replace").strip()
        if text:
            rows.append({"audio": str(audio_candidates[0]), "text": text})
    logger.info(f"Paired {len(rows):,} audio/transcript examples.")
    ds = hfds.Dataset.from_list(rows).cast_column(
        "audio", hfds.Audio(sampling_rate=16_000)
    )
    return ds


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--raw-dir", type=Path, default=None)
    args = parser.parse_args()

    raw_dir = args.raw_dir
    if raw_dir is None:
        raw_dir = args.output_dir / "raw"
        raw_dir.mkdir(parents=True, exist_ok=True)
        archives = download_archives(raw_dir)
        if not archives:
            logger.error(
                "Cannot download Nota in this environment; pass --raw-dir."
            )
            return
        for archive in archives:
            with zipfile.ZipFile(archive) as zf:
                zf.extractall(raw_dir)

    dataset = build_dataset(raw_dir)
    dataset.save_to_disk(str(args.output_dir / "arrow"))
    logger.info(f"Saved Nota to {args.output_dir / 'arrow'}")


if __name__ == "__main__":
    main()
