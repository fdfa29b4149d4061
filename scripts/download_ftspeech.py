"""Download the FTSpeech dataset release.

The reference automates the publisher's login-gated download with headless
Selenium/Firefox (reference: ``src/scripts/download_ftspeech.py:43-50``).
Selenium is not available in this environment, so this script drives the same
flow when Selenium is installed and otherwise prints the manual steps::

    python scripts/download_ftspeech.py --output-dir data/ftspeech
"""

import argparse
import logging
from pathlib import Path

logger = logging.getLogger("ftspeech_download")

FTSPEECH_URL = "https://ftspeech.github.io/"


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args()
    args.output_dir.mkdir(parents=True, exist_ok=True)

    try:
        from selenium import webdriver
        from selenium.webdriver.firefox.options import Options
    except ImportError:
        logger.warning(
            "Selenium is not installed. FTSpeech requires an agreement-gated "
            f"manual download:\n  1. Visit {FTSPEECH_URL} and request access.\n"
            "  2. Download the archives into "
            f"{args.output_dir}.\n  3. Run scripts/build_ftspeech.py."
        )
        return

    options = Options()
    options.add_argument("--headless")
    options.set_preference("browser.download.folderList", 2)
    options.set_preference("browser.download.dir", str(args.output_dir))
    options.set_preference(
        "browser.helperApps.neverAsk.saveToDisk", "application/gzip"
    )
    driver = webdriver.Firefox(options=options)
    try:
        driver.get(FTSPEECH_URL)
        logger.info(
            "Opened the FTSpeech page; follow the download links. Files land "
            f"in {args.output_dir}."
        )
    finally:
        driver.quit()


if __name__ == "__main__":
    main()
