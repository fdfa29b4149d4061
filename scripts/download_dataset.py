"""Download a dataset snapshot from the Hugging Face Hub.

Rebuild of the reference's snapshot script (reference:
``src/scripts/download_dataset.py:36-41``)::

    python scripts/download_dataset.py --dataset-id CoRal-project/coral-v3 \
        --output-dir data/coral-v3
"""

import argparse
import logging

logger = logging.getLogger("coral_download")


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset-id", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--revision", default=None)
    args = parser.parse_args()

    from huggingface_hub import snapshot_download

    path = snapshot_download(
        repo_id=args.dataset_id,
        repo_type="dataset",
        revision=args.revision,
        local_dir=args.output_dir,
    )
    logger.info(f"Downloaded {args.dataset_id} to {path}")


if __name__ == "__main__":
    main()
