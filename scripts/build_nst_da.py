"""Download and build the NST-da (Nordisk Språkteknologi) Danish ASR dataset.

Semantic rebuild of the reference's builder (reference:
``src/scripts/build_nst_da.py``): fetch the five Sprakbanken archives,
reorganise the raw layout into ``train/``/``test/`` trees, drop the known-bad
recordings, and assemble an HF dataset::

    python scripts/build_nst_da.py --output-dir data/nst-da
"""

import argparse
import logging
import shutil
import tarfile
import zipfile
from pathlib import Path

logger = logging.getLogger("nst_builder")

BASE_URL = "https://www.nb.no/sbfil/talegjenkjenning/16kHz_2020/dk_2020"

# Archive-name -> URL, matching the reference's inventory
# (reference: src/scripts/build_nst_da.py:31-40).
DATA_URLS = {
    "train_metadata": f"{BASE_URL}/ADB_OD_DAN_0565.tar.gz",
    "train_audio": f"{BASE_URL}/lydfiler_16_begge.tar.gz",
    "test_and_errors": f"{BASE_URL}/supplement_dk.tar.xz",
    "metadata_csvs": f"{BASE_URL}/metadata_dk_csv.zip",
    "readme": f"{BASE_URL}/dk-16khz_reorganized_02.pdf",
}

SAMPLE_RATE = 16_000

# Recordings that cannot be decoded, catalogued by find_faulty_audio_clips
# (reference: build_nst_da.py:206-210).
BAD_FILE_PREFIXES = (
    "dk11x242-18072000-1149_u0047",
    "dk16xx41-24092000-1951_u0042",
)
# Files under this size are truncated/empty recordings
# (reference: build_nst_da.py:221-229).
MIN_AUDIO_BYTES = 8192


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


def extract(archive: Path, into: Path) -> None:
    if archive.suffix == ".zip":
        with zipfile.ZipFile(archive) as zf:
            zf.extractall(into)
    elif archive.suffix == ".pdf":
        shutil.copy(archive, into / archive.name)
    else:
        with tarfile.open(archive) as tf:
            tf.extractall(into)


def reorganise_files(dataset_dir: Path) -> None:
    """Raw extracted archives -> ``train/``/``test/`` trees.

    Mirrors the reference's reorganisation pass (reference:
    ``build_nst_da.py:127-192``): training audio is flattened out of the
    per-directory ``dk/`` tree, the supplement archive contributes the test
    audio/metadata plus the training error catalogue, and the CSV archive is
    split into the two per-split ``metadata.csv`` files.
    """
    logger.info("Reorganising files")
    data_dir = Path(dataset_dir)
    train_dir = data_dir / "train"
    test_dir = data_dir / "test"
    train_audio = train_dir / "audio"
    test_audio = test_dir / "audio"
    train_audio.mkdir(parents=True, exist_ok=True)
    test_audio.mkdir(parents=True, exist_ok=True)

    def flatten_wavs(root: Path, into: Path) -> None:
        for sub in root.iterdir():
            if not sub.is_dir():
                continue
            for wav in sub.glob("*.wav"):
                wav.rename(into / wav.name)

    for name in DATA_URLS:
        name_dir = data_dir / name
        if not name_dir.exists():
            continue
        if name == "train_metadata":
            shutil.move(str(name_dir), str(train_dir / "metadata"))
        elif name == "train_audio":
            flatten_wavs(name_dir / "dk", train_audio)
            shutil.rmtree(name_dir)
        elif name == "test_and_errors":
            # The supplement holds the test set plus corrections for the
            # training data.
            supplement = name_dir / "supplement_dk"
            testdata = supplement / "testdata"
            flatten_wavs(testdata / "audio", test_audio)
            shutil.move(str(testdata / "metadata"), str(test_dir / "metadata"))
            log_file = testdata / "sprakbanken_0611_transform.log"
            if log_file.exists():
                log_file.rename(test_dir / "log.log")
            errors = supplement / "dk_errorfiles_train.json"
            if errors.exists():
                errors.rename(train_dir / "errorfiles.json")
            manifest = testdata / "dk_manifest_test.json"
            if manifest.exists():
                manifest.rename(test_dir / "manifest.json")
            shutil.rmtree(name_dir)
        elif name == "metadata_csvs":
            (name_dir / "NST_dk.csv").rename(train_dir / "metadata.csv")
            (name_dir / "supplement_dk.csv").rename(test_dir / "metadata.csv")
            shutil.rmtree(name_dir)
        elif name == "readme":
            pdfs = list(name_dir.glob("*.pdf"))
            if pdfs:
                pdfs[0].rename(data_dir / "README.pdf")
            shutil.rmtree(name_dir)


def remove_bad_files(dataset_dir: Path) -> int:
    """Drop undecodable and too-small recordings from both splits.

    The known-bad prefixes and the 8 KiB floor come from the reference's
    curation pass (reference: ``build_nst_da.py:195-229``). Returns the number
    of files removed.
    """
    removed = 0
    for split in ("train", "test"):
        audio_dir = Path(dataset_dir) / split / "audio"
        if not audio_dir.exists():
            continue
        for wav in audio_dir.glob("*.wav"):
            if any(wav.stem.startswith(p) for p in BAD_FILE_PREFIXES):
                logger.info(f"Removing {wav.name}: known-undecodable.")
                wav.unlink()
                removed += 1
                continue
            size = wav.stat().st_size
            if size < MIN_AUDIO_BYTES:
                logger.info(f"Removing {wav.name}: only {size} bytes.")
                wav.unlink()
                removed += 1
    return removed


def build_dataset(dataset_dir: Path) -> "datasets.DatasetDict":  # noqa: F821
    """Reorganised layout -> HF dataset keyed by the per-split metadata.csv."""
    import csv

    import datasets as hfds

    splits = {}
    for split in ("train", "test"):
        split_dir = Path(dataset_dir) / split
        rows = []
        csv_path = split_dir / "metadata.csv"
        if csv_path.exists():
            with csv_path.open(encoding="utf-8", errors="replace") as f:
                for rec in csv.DictReader(f):
                    wav = split_dir / "audio" / Path(
                        rec.get("filename_both_channels")
                        or rec.get("filename")
                        or ""
                    ).name
                    text = (rec.get("text") or "").strip()
                    if not wav.exists() or not text:
                        continue
                    rows.append({"audio": str(wav), "text": text})
        else:
            # Fallback for raw trees without the CSV archive: the 'spl'
            # transcript files.
            for spl in sorted(split_dir.rglob("*.spl")):
                for line in spl.read_text(
                    encoding="latin-1", errors="replace"
                ).splitlines():
                    parts = line.split(">-<")
                    if len(parts) < 2:
                        continue
                    wav = split_dir / "audio" / parts[0].strip()
                    if wav.exists() and parts[1].strip():
                        rows.append({"audio": str(wav),
                                     "text": parts[1].strip()})
        if rows:
            splits[split] = hfds.Dataset.from_list(rows).cast_column(
                "audio", hfds.Audio(sampling_rate=SAMPLE_RATE)
            )
    return hfds.DatasetDict(splits)


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
        for name, url in DATA_URLS.items():
            archive = download(url, raw_dir / Path(url).name)
            if archive is None:
                logger.error(
                    "Cannot download NST-da in this environment; pass "
                    "--raw-dir pointing at an existing copy."
                )
                return
            target = raw_dir / name
            target.mkdir(exist_ok=True)
            extract(archive, target)

    reorganise_files(raw_dir)
    removed = remove_bad_files(raw_dir)
    logger.info(f"Removed {removed} bad audio files.")
    dataset = build_dataset(raw_dir)
    dataset.save_to_disk(str(args.output_dir / "arrow"))
    logger.info(f"Saved NST-da to {args.output_dir / 'arrow'}")


if __name__ == "__main__":
    main()
