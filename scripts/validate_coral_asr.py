"""Validate a speech dataset with a bootstrap ASR model and push the result.

CLI-compatible with the reference's entry point (reference:
``src/scripts/validate_coral_asr.py``): load the dataset, transcribe every
sample with the validation model, attach per-sample CER/WER columns, drop
samples above ``max_cer``, and (optionally) push the validated dataset::

    python scripts/validate_coral_asr.py dataset=synthetic://64 \
        model_id=models/roest-315m push_to_hub=false
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from coral_tpu.config import compose

logger = logging.getLogger("coral_validation")


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    config = compose(
        "dataset_validation",
        overrides=sys.argv[1:],
        config_path=Path(__file__).parent.parent / "config",
    )
    from coral_tpu.data.loading import make_raw_source
    from coral_tpu.data.validation import add_validations
    from coral_tpu.evaluation.evaluate import load_saved_predictor

    raw = make_raw_source(
        config.dataset.split("::")[0],
        config.dataset.split("::")[1] if "::" in config.dataset else None,
        split=config.get("train_name", "train"),
        cache_dir=config.get("cache_dir"),
    )
    predictor, _ = load_saved_predictor(config)

    validated = list(
        add_validations(
            raw(),
            predictor=predictor,
            model_id=str(config.model_id),
            text_column=config.get("text_column", "text"),
            audio_column=config.get("audio_column", "audio"),
            lower_case=bool(config.get("lower_case", True)),
            sampling_rate=int(config.sampling_rate),
            characters_to_keep=config.get("characters_to_keep"),
            batch_size=int(config.batch_size),
            max_cer=float(config.max_cer),
            max_pad_seconds=float(config.get("max_seconds_per_example", 10)),
        )
    )
    logger.info(f"Validated dataset holds {len(validated):,} samples.")

    output_id = config.get("output_dataset_id")
    if output_id:
        import datasets as hfds

        rows = [
            {k: v for k, v in row.items() if k not in ("audio_array",)}
            for row in validated
        ]
        ds = hfds.Dataset.from_list(rows)
        # Upload with the reference's 60 x 1-minute retry loop
        # (reference: validate_coral_asr.py:77-94).
        import time

        for attempt in range(60):
            try:
                ds.push_to_hub(
                    output_id, config_name=config.get("output_dataset_subset")
                    or "default",
                )
                break
            except Exception as error:
                logger.warning(f"Upload failed ({error}); retrying in 60 s.")
                time.sleep(60)
    else:
        out_path = Path(config.get("output_path", "validated-dataset"))
        import json

        out_path.mkdir(parents=True, exist_ok=True)
        with (out_path / "validated.jsonl").open("w", encoding="utf-8") as f:
            for row in validated:
                row = {k: v for k, v in row.items()
                       if k not in ("audio", "audio_array")}
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
        logger.info(f"Wrote validation results to {out_path}/validated.jsonl")


if __name__ == "__main__":
    main()
