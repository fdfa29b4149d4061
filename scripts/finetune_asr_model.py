"""Fine-tune an ASR model on Danish speech data.

CLI-compatible with the reference's Hydra entry point (reference:
``src/scripts/finetune_asr_model.py``): the same config tree and override grammar,
e.g.::

    python scripts/finetune_asr_model.py model=wav2vec2-small \
        datasets=[coral_read_aloud] total_batch_size=256 max_steps=100000
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
    from coral_tpu.training.finetune import finetune

    finetune(config)


if __name__ == "__main__":
    main()
