"""Build model-comparison bar plots from evaluation CSVs.

Rebuild of the reference's plotting script (reference:
``src/scripts/create_comparison_plot.py``): glob the evaluation CSVs produced by
``evaluate_model.py``, pull each model's overall metric (the all-None marginal
row), and render grouped bars per dataset::

    python scripts/create_comparison_plot.py --metric cer --output comparison.png
"""

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

logger = logging.getLogger("coral_plots")


def load_evaluation_df(csv_path: Path):
    """One CSV -> (model_id, dataset, overall scores dict)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    stem = csv_path.stem  # "{model-id}.{dataset}"
    model_id, _, dataset = stem.partition(".")
    overall = df[
        df.get("age_group").isna() & df.get("gender").isna()
        & df.get("dialect").isna()
    ]
    if overall.empty:
        return None
    row = overall.iloc[0]
    return {
        "model": model_id,
        "dataset": dataset,
        "cer": float(row["cer"]),
        "wer": float(row["wer"]),
    }


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--csv-dir", type=Path, default=Path("."))
    parser.add_argument("--metric", choices=["cer", "wer"], default="cer")
    parser.add_argument("--output", type=Path, default=Path("comparison.png"))
    args = parser.parse_args()

    records = [
        rec
        for csv_path in sorted(args.csv_dir.glob("*.csv"))
        if (rec := load_evaluation_df(csv_path)) is not None
    ]
    if not records:
        logger.error(f"No evaluation CSVs found under {args.csv_dir}.")
        sys.exit(1)

    import pandas as pd

    df = pd.DataFrame.from_records(records)
    pivot = df.pivot_table(index="model", columns="dataset",
                           values=args.metric)

    import matplotlib

    matplotlib.use("Agg")

    ax = pivot.plot.bar(figsize=(10, 6), rot=30)
    ax.set_ylabel(args.metric.upper())
    ax.set_title(f"Model comparison ({args.metric.upper()}, lower is better)")
    ax.figure.tight_layout()
    ax.figure.savefig(args.output, dpi=150)
    logger.info(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
