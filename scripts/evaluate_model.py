"""Evaluate an ASR model on a Danish evaluation dataset.

CLI-compatible with the reference's Hydra entry point (reference:
``src/scripts/evaluate_model.py``), including the CSV naming scheme
``{model-id}.{dataset}.csv``::

    python scripts/evaluate_model.py model_id=models/roest-315m \
        dataset="CoRal-project/coral-v3::read_aloud"
"""

import logging
import re
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
        "evaluation",
        overrides=sys.argv[1:],
        config_path=Path(__file__).parent.parent / "config",
    )
    from coral_tpu.evaluation.evaluate import evaluate

    score_df = evaluate(config)

    if config.get("store_results", True):
        # Reference naming: '/' -> '--', '.' and '::' -> '-'
        # (reference: src/scripts/evaluate_model.py:50-65).
        single_dash = re.compile(r"\.|\:\:")
        double_dash = re.compile(r"\/")
        model_id = single_dash.sub("-", double_dash.sub("--", str(config.model_id)))
        if config.get("no_lm", False):
            model_id += "-no-lm"
        dataset = single_dash.sub("-", double_dash.sub("--", str(config.dataset)))
        filename = Path(f"{model_id}.{dataset}.csv")
        score_df.to_csv(filename, index=False)
        logging.getLogger("coral_evaluation").info(f"Stored results in {filename}")


if __name__ == "__main__":
    main()
