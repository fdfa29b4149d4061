"""Evaluation-pipeline tests: dataset grammar, demographic breakdown, score math."""

import numpy as np
import pandas as pd
import pytest

from coral_tpu.data.loading import (
    interpret_dataset_name,
    load_dataset_for_evaluation,
)
from coral_tpu.evaluation.evaluate import (
    convert_evaluation_rows_to_df,
    get_score_df,
)


@pytest.mark.parametrize(
    "name, expected",
    [
        ("org/data", ("org/data", None, None)),
        ("org/data::subset", ("org/data", "subset", None)),
        ("org/data@rev", ("org/data", None, "rev")),
        ("org/data::subset@rev", ("org/data", "subset", "rev")),
    ],
)
def test_interpret_dataset_name(name, expected):
    assert interpret_dataset_name(name) == expected


def test_load_dataset_for_evaluation_synthetic(config_path):
    from coral_tpu.config import compose

    config = compose(
        "evaluation",
        overrides=["dataset=synthetic://8", "model_id=dummy", "cache_dir=null"],
        config_path=config_path,
    )
    rows = list(load_dataset_for_evaluation(config)())
    assert len(rows) > 0
    for row in rows:
        assert "audio_array" in row and "text" in row
        assert "dialect" in row and "age" in row


def test_convert_rows_applies_age_bins_and_dialect_map():
    rows = [
        {"age": 20, "gender": "female", "dialect": "vestjysk",
         "country_birth": "DK", "text": "a"},
        {"age": 30, "gender": "male", "dialect": "østjysk",
         "country_birth": None, "text": "b"},
        {"age": 70, "gender": "female", "dialect": "fynsk",
         "country_birth": "SE", "text": "c"},
    ]
    mapping = {"vestjysk": "Vestjysk", "østjysk": "Østjysk", "fynsk": "Fynsk"}
    df = convert_evaluation_rows_to_df(rows, mapping)
    assert list(df.age_group) == ["0-25", "25-50", "50+"]
    assert list(df.dialect) == ["Vestjysk", "Østjysk", "Non-native"]


def test_get_score_df_marginals_and_values():
    df = pd.DataFrame(
        {
            "age_group": ["0-25", "0-25", "50+", "50+"],
            "gender": ["female", "male", "female", "male"],
            "dialect": ["A", "A", "B", "B"],
            "text": ["hej med dig", "god dag", "hej igen", "farvel"],
            "prediction": ["hej med dig", "god dag", "hej igen", "farvel"],
        }
    )
    scores = get_score_df(df, categories=["age_group", "gender", "dialect"])
    # perfect predictions -> all-zero error rates
    assert (scores.cer == 0).all() and (scores.wer == 0).all()
    # the all-None marginal (entire dataset) is present exactly once
    marginal = scores[
        scores.age_group.isna() & scores.gender.isna() & scores.dialect.isna()
    ]
    assert len(marginal) == 1


def test_get_score_df_detects_errors():
    df = pd.DataFrame(
        {
            "age_group": ["0-25", "0-25"],
            "gender": ["female", "male"],
            "dialect": ["A", "A"],
            "text": ["hej med dig", "god dag"],
            "prediction": ["hej uden dig", "god dag"],
        }
    )
    scores = get_score_df(df, categories=["age_group", "gender", "dialect"])
    overall = scores[
        scores.age_group.isna() & scores.gender.isna() & scores.dialect.isna()
    ].iloc[0]
    assert overall.wer == pytest.approx(1 / 5)  # 1 substituted word of 5
    assert 0 < overall.cer < 1


def test_bootstrap_interval_brackets_score():
    from coral_tpu.evaluation.evaluate import bootstrap_interval
    from coral_tpu.evaluation.metrics import wer

    labels = ["hej med dig", "god dag", "farvel igen", "tak for nu"] * 5
    predictions = ["hej uden dig", "god dag", "farvel igen", "tak for nu"] * 5
    point = wer(predictions=predictions, labels=labels)
    lo, hi = bootstrap_interval(predictions, labels, wer, n_bootstrap=200)
    assert lo <= point <= hi
    assert 0.0 <= lo < hi <= 1.0


def test_get_score_df_with_bootstrap():
    df = pd.DataFrame(
        {
            "age_group": ["0-25"] * 4 + ["50+"] * 4,
            "gender": ["female", "male"] * 4,
            "dialect": ["A"] * 8,
            "text": ["hej med dig", "god dag", "hej igen", "farvel"] * 2,
            "prediction": ["hej uden dig", "god dag", "hej igen", "farvel"] * 2,
        }
    )
    scores = get_score_df(
        df, categories=["age_group", "gender", "dialect"], n_bootstrap=50
    )
    overall = scores[
        scores.age_group.isna() & scores.gender.isna() & scores.dialect.isna()
    ].iloc[0]
    assert overall.wer_ci_low <= overall.wer <= overall.wer_ci_high
