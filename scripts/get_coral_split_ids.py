"""Search for balanced validation/test speaker sets for the CoRal splits.

Semantic rebuild of the reference's split-search tool (reference:
``src/scripts/get_coral_split_ids.py``): greedy weighted speaker sampling until
demographic minima (gender / dialect / age-group percentages) are met, repeated
over many seeds; candidates are ranked by the sum of their ranks in difficulty
(mean bootstrap ASR CER, harder is better), size (smaller is better), and
demographic-distribution variance (lower is better)::

    python scripts/get_coral_split_ids.py num_split_attempts=200
"""

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from coral_tpu.config import compose

logger = logging.getLogger("coral_splits")

AGE_GROUPS = [(0, 25), (25, 50), (50, 1000)]


def age_group_of(age) -> str:
    for lo, hi in AGE_GROUPS:
        if age is not None and lo <= age < hi:
            return f"{lo}-{hi}"
    return "unknown"


class EvalDataset:
    """Greedy weighted speaker sample meeting demographic minima.

    Mirrors the reference's ``EvalDataset`` (get_coral_split_ids.py:256-520):
    the per-feature weight is ``max(1 - pct / required_pct, 1e-6)`` — near 1
    while a feature value is underrepresented, ~0 once its minimum is met — and
    a speaker's sampling weight is the sum of its feature weights.
    """

    def __init__(
        self,
        speakers: "pandas.DataFrame",  # noqa: F821
        requirements: dict[str, float],
        banned_speakers: set[str],
        min_hours: float,
        max_hours: float,
        mean_seconds_per_sample: float,
        seed: int,
    ) -> None:
        self.speakers = speakers[
            ~speakers.id_speaker.isin(banned_speakers)
        ].reset_index(drop=True)
        self.requirements = requirements
        self.min_samples = int(min_hours * 3600 / mean_seconds_per_sample)
        self.max_samples = int(max_hours * 3600 / mean_seconds_per_sample)
        self.rng = np.random.default_rng(seed)
        self.chosen: list[int] = []
        self.num_samples = 0
        self.counts = {
            "gender": {}, "dialect": {}, "age_group": {},
        }
        self.satisfies_requirements = self.populate()

    def _weights(self) -> dict[str, dict[str, float]]:
        out = {}
        for feature, counts in self.counts.items():
            total = max(self.num_samples, 1)
            required = self.requirements[feature]
            out[feature] = {
                value: max(1 - (count / total) / required, 1e-6)
                for value, count in counts.items()
            }
        return out

    def _speaker_weight(self, row, weights) -> float:
        return (
            weights["gender"].get(row.gender, 1.0)
            + weights["dialect"].get(row.dialect, 1.0)
            + weights["age_group"].get(age_group_of(row.age), 1.0)
        )

    def _meets_requirements(self) -> bool:
        total = max(self.num_samples, 1)
        for feature, counts in self.counts.items():
            required = self.requirements[feature]
            for count in counts.values():
                if count / total < required:
                    return False
        return True

    def populate(self) -> bool:
        available = self.speakers.copy()
        # Seed the count keys with every observed feature value.
        for _, row in available.iterrows():
            self.counts["gender"].setdefault(row.gender, 0)
            self.counts["dialect"].setdefault(row.dialect, 0)
            self.counts["age_group"].setdefault(age_group_of(row.age), 0)

        while len(available) > 0 and (
            self.num_samples < self.min_samples or not self._meets_requirements()
        ):
            if self.num_samples >= self.max_samples:
                return False  # overshot without meeting the minima
            weights = self._weights()
            w = np.asarray(
                [self._speaker_weight(row, weights)
                 for _, row in available.iterrows()]
            )
            idx = self.rng.choice(len(available), p=w / w.sum())
            row = available.iloc[idx]
            self.chosen.append(row.name)
            self.num_samples += int(row.num_samples)
            self.counts["gender"][row.gender] += int(row.num_samples)
            self.counts["dialect"][row.dialect] += int(row.num_samples)
            self.counts["age_group"][age_group_of(row.age)] += int(
                row.num_samples
            )
            available = available.drop(index=row.name)
        return self._meets_requirements() and (
            self.min_samples <= self.num_samples <= self.max_samples
        )

    @property
    def speaker_ids(self) -> tuple[str, ...]:
        return tuple(sorted(self.speakers.loc[self.chosen].id_speaker))

    @property
    def difficulty(self) -> float:
        sub = self.speakers.loc[self.chosen]
        return float(sub.asr_cer.mean()) if "asr_cer" in sub else 0.0

    @property
    def distribution_variance(self) -> float:
        total = max(self.num_samples, 1)
        return float(
            sum(
                np.var([c / total for c in counts.values()])
                for counts in self.counts.values()
            )
        )

    def __len__(self) -> int:
        return self.num_samples


def rank_candidates(candidates: list[EvalDataset]) -> list[EvalDataset]:
    """Sum-of-ranks over difficulty (desc), size (asc), variance (asc)."""
    by_difficulty = sorted(candidates, key=lambda c: c.difficulty, reverse=True)
    by_length = sorted(candidates, key=len)
    by_variance = sorted(candidates, key=lambda c: c.distribution_variance)
    return sorted(
        candidates,
        key=lambda c: (
            by_difficulty.index(c) + by_length.index(c) + by_variance.index(c)
        ),
    )


def load_speaker_df(config):
    """Per-speaker stats from the CoRal metadata (or a local parquet/csv)."""
    import pandas as pd

    path = config.get("speaker_stats_path")
    if path and Path(path).exists():
        df = (pd.read_parquet(path) if str(path).endswith(".parquet")
              else pd.read_csv(path))
        return df
    # Fall back to streaming the dataset and aggregating per speaker.
    import datasets as hfds

    ds = hfds.load_dataset(
        config.dataset_path, "read_aloud", split="train", streaming=True,
        revision=config.get("dataset_revision"),
    )
    rows = {}
    for ex in ds:
        spk = ex["id_speaker"]
        row = rows.setdefault(
            spk,
            {
                "id_speaker": spk, "gender": ex.get("gender"),
                "age": ex.get("age"), "dialect": ex.get("dialect"),
                "num_samples": 0, "asr_cer_sum": 0.0,
            },
        )
        row["num_samples"] += 1
        row["asr_cer_sum"] += float(ex.get("asr_cer") or 0.0)
    df = pd.DataFrame(rows.values())
    df["asr_cer"] = df.asr_cer_sum / df.num_samples.clip(lower=1)
    return df.drop(columns=["asr_cer_sum"])


def main() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s ⋅ %(name)s ⋅ %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    config = compose(
        "split_creation",
        overrides=sys.argv[1:],
        config_path=Path(__file__).parent.parent / "config",
    )
    speakers = load_speaker_df(config)
    banned = set(config.get("banned_speakers") or [])

    def search(requirements_cfg, exclude: set[str]) -> EvalDataset | None:
        candidates = []
        for seed in range(int(config.num_split_attempts)):
            candidate = EvalDataset(
                speakers[~speakers.id_speaker.isin(exclude)],
                requirements={
                    "gender": requirements_cfg.gender_pct,
                    "dialect": requirements_cfg.dialect_pct,
                    "age_group": requirements_cfg.age_group_pct,
                },
                banned_speakers=banned,
                min_hours=requirements_cfg.min_hours,
                max_hours=requirements_cfg.max_hours,
                mean_seconds_per_sample=float(config.mean_seconds_per_sample),
                seed=seed,
            )
            if candidate.satisfies_requirements:
                candidates.append(candidate)
        if not candidates:
            return None
        return rank_candidates(candidates)[0]

    test = search(config.requirements.test, exclude=set())
    if test is None:
        logger.error("No test split satisfied the requirements.")
        sys.exit(1)
    logger.info(
        f"Test split: {len(test.speaker_ids)} speakers, ~{len(test)} samples, "
        f"difficulty {test.difficulty:.3f}"
    )
    val = search(config.requirements.val, exclude=set(test.speaker_ids))
    if val is None:
        logger.error("No validation split satisfied the requirements.")
        sys.exit(1)
    logger.info(
        f"Val split: {len(val.speaker_ids)} speakers, ~{len(val)} samples"
    )

    print("test_speakers:")
    for spk in test.speaker_ids:
        print(f" - {spk}")
    print("val_speakers:")
    for spk in val.speaker_ids:
        print(f" - {spk}")


if __name__ == "__main__":
    main()
