"""Train an n-gram decoder language model for a fine-tuned wav2vec2 model.

CLI-compatible with the reference's entry point (reference:
``src/scripts/train_ngram_decoder.py``), reusing the ``asr_finetuning`` config::

    python scripts/train_ngram_decoder.py model=wav2vec2-small \
        model_dir=models/roest-315m
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from coral_tpu.config import compose


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    config = compose(
        "asr_finetuning",
        overrides=sys.argv[1:],
        config_path=Path(__file__).parent.parent / "config",
    )
    from coral_tpu.decoding.ngram_pipeline import train_and_store_ngram_model

    train_and_store_ngram_model(config)


if __name__ == "__main__":
    main()
