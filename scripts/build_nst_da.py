"""Download and build the NST-da (Nordisk Språkteknologi) Danish ASR dataset.

Semantic rebuild of the reference's builder (reference:
``src/scripts/build_nst_da.py``): fetch the Sprakbanken archives, reorganise the
raw files, drop the known-bad recordings, and assemble an HF dataset::

    python scripts/build_nst_da.py --output-dir data/nst-da
"""

import argparse
import logging
import tarfile
from pathlib import Path

logger = logging.getLogger("nst_builder")

DATA_URLS = [
    "https://www.nb.no/sbfil/talegjenkjenning/16kHz_2020/dk_2020/da.16kHz.0611.tar.gz",
    "https://www.nb.no/sbfil/talegjenkjenning/16kHz_2020/dk_2020/ADB_OD_DAN.tar.gz",
    "https://www.nb.no/sbfil/talegjenkjenning/16kHz_2020/dk_2020/dk_2020_metadata.tar.gz",
]


def download(url: str, target: Path) -> Path | None:
    if target.exists():
        return target
    try:
        import httpx

        logger.info(f"Downloading {url}...")
        with httpx.stream("GET", url, follow_redirects=True, timeout=60) as r:
            r.raise_for_status()
            with target.open("wb") as f:
                for chunk in r.iter_bytes():
                    f.write(chunk)
        return target
    except Exception as error:
        logger.error(f"Download failed for {url}: {error}")
        return None


def build_dataset(raw_dir: Path) -> "datasets.DatasetDict":  # noqa: F821
    """Raw NST layout -> HF dataset (transcripts in the 'spl' metadata files)."""
    import datasets as hfds

    rows = []
    for spl in sorted(raw_dir.rglob("*.spl")):
        for line in spl.read_text(encoding="latin-1",
                                  errors="replace").splitlines():
            parts = line.split(">-<")
            if len(parts) < 2:
                continue
            wav_name, text = parts[0].strip(), parts[1].strip()
            wav_path = raw_dir / "audio" / wav_name
            if not wav_path.exists() or not text:
                continue
            rows.append({"audio": str(wav_path), "text": text})
    ds = hfds.Dataset.from_list(rows).cast_column(
        "audio", hfds.Audio(sampling_rate=16_000)
    )
    return hfds.DatasetDict({"train": ds})


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--raw-dir", type=Path, default=None,
                        help="Already-downloaded raw tree (skips the fetch).")
    args = parser.parse_args()

    raw_dir = args.raw_dir
    if raw_dir is None:
        raw_dir = args.output_dir / "raw"
        raw_dir.mkdir(parents=True, exist_ok=True)
        for url in DATA_URLS:
            archive = download(url, raw_dir / Path(url).name)
            if archive is None:
                logger.error(
                    "Cannot download NST-da in this environment; pass --raw-dir "
                    "pointing at an existing copy."
                )
                return
            with tarfile.open(archive) as tf:
                tf.extractall(raw_dir)

    dataset = build_dataset(raw_dir)
    dataset.save_to_disk(str(args.output_dir / "arrow"))
    logger.info(f"Saved NST-da to {args.output_dir / 'arrow'}")


if __name__ == "__main__":
    main()
