"""Push a local dataset to the Hugging Face Hub with retry.

Rebuild of the reference's upload script (reference: ``src/scripts/push_to_hub.py``,
infinite 1-minute retry loop at lines 46-55)::

    python scripts/push_to_hub.py --dataset-dir data/final --dataset-id org/name
"""

import argparse
import logging
import time

logger = logging.getLogger("coral_push")


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset-dir", required=True)
    parser.add_argument("--dataset-id", required=True)
    parser.add_argument("--private", action="store_true")
    parser.add_argument("--max-retries", type=int, default=0,
                        help="0 = retry forever (reference behaviour)")
    args = parser.parse_args()

    import datasets as hfds

    dataset = hfds.load_from_disk(args.dataset_dir)
    attempt = 0
    while True:
        try:
            dataset.push_to_hub(args.dataset_id, private=args.private)
            logger.info(f"Pushed {args.dataset_dir} to {args.dataset_id}")
            return
        except Exception as error:
            attempt += 1
            if args.max_retries and attempt >= args.max_retries:
                raise
            logger.warning(f"Upload failed ({error}); retrying in 60 s.")
            time.sleep(60)


if __name__ == "__main__":
    main()
