"""Full-model evaluation with demographic score breakdown.

TPU-native rebuild of the reference's evaluation pipeline (reference:
``src/coral/evaluate.py:29-216``): load the evaluation split, transcribe it with a
jitted batched predictor (greedy CTC decode or Whisper generation — replacing the
HF ASR ``pipeline``), re-normalise predictions through the text pipeline, then
score WER/CER over the Cartesian product of {age_group, gender, dialect} including
None marginals.
"""

from __future__ import annotations

import itertools as it
import logging
from pathlib import Path
from typing import Any, Callable

import numpy as np

from ..data.loading import load_dataset_for_evaluation
from ..data.processing import process_example
from ..evaluation.metrics import cer, wer

logger = logging.getLogger(__package__)

AGE_GROUPS = {"0-25": (0, 25), "25-50": (26, 50), "50+": (50, None)}


def evaluate(config: Any) -> "pandas.DataFrame":  # noqa: F821
    """Evaluate a model on an evaluation dataset.

    Args:
        config: The composed evaluation configuration (``config/evaluation.yaml``
            surface: ``model_id``, ``dataset``, ``batch_size``, ...).

    Returns:
        A DataFrame with WER/CER per demographic combination.
    """
    assert config.model_id is not None, (
        "`model_id` must be set to perform an evaluation!"
    )

    logger.info("Loading the dataset...")
    source = load_dataset_for_evaluation(config)

    logger.info(f"Loading the {config.model_id!r} ASR model...")
    predictor, batch_geometry = load_saved_predictor(config)

    rows: list[dict] = []
    predictions: list[str] = []
    from .eval_loop import batch_for_eval

    def tee(stream):
        for example in stream:
            rows.append({k: v for k, v in example.items() if k != "audio_array"})
            yield example

    for batch, texts in batch_for_eval(
        tee(source()),
        batch_size=int(config.batch_size),
        **batch_geometry,
    ):
        for raw_prediction in predictor(batch)[: len(texts)]:
            # Re-normalise the prediction through the text pipeline
            # (reference: src/coral/evaluate.py:61-73).
            prediction = process_example(
                example={"text": raw_prediction},
                characters_to_keep=config.characters_to_keep,
                text_column="text",
                audio_column=None,
                lower_case=True,
                convert_numerals=True,
            )["text"]
            predictions.append(prediction)

    logger.info("Computing the scores for each metadata category...")
    df = convert_evaluation_rows_to_df(
        rows, sub_dialect_to_dialect_mapping=dict(config.sub_dialect_to_dialect)
    )
    df["prediction"] = predictions
    return get_score_df(
        df=df,
        categories=["age_group", "gender", "dialect"],
        n_bootstrap=int(config.get("bootstrap_samples", 0) or 0),
    )


def convert_evaluation_rows_to_df(
    rows: list[dict], sub_dialect_to_dialect_mapping: dict[str, str]
) -> "pandas.DataFrame":  # noqa: F821
    """Metadata rows -> DataFrame with age bins, dialect map, non-native override
    (reference: ``src/coral/evaluate.py:88-120``)."""
    import pandas as pd

    df = pd.DataFrame.from_records(rows)

    if "age" in df.columns:
        df["age_group"] = df.age.map(
            lambda x: next(
                group
                for group, (start, end) in AGE_GROUPS.items()
                if (start is None or x >= start) and (end is None or x < end)
            )
        )
    else:
        df["age_group"] = None

    if "dialect" in df.columns:
        df.dialect = df.dialect.map(
            lambda d: sub_dialect_to_dialect_mapping.get(d, d)
        )
    else:
        df["dialect"] = None

    if "country_birth" in df.columns:
        df.country_birth = df.country_birth.map(
            lambda x: "DK" if pd.isna(x) else x
        )
        df.loc[df.country_birth != "DK", "dialect"] = "Non-native"

    if "gender" not in df.columns:
        df["gender"] = None
    return df


def load_saved_predictor(config: Any) -> tuple[Callable, dict]:
    """Build a jitted transcriber for a saved model.

    ``model_id`` may be a coral-tpu model directory (``config.yaml`` +
    ``model/`` orbax params + tokenizer files) or a pretrained HF id/path
    (reference analogue: ``load_asr_pipeline``, ``src/coral/evaluate.py:123-158``).

    Returns:
        ``(predict(batch) -> list[str], batch_geometry_kwargs)``.
    """
    import jax

    from ..config import DictConfig
    from ..parallel import create_mesh, replicated
    from ..training.model_setup import load_model_setup

    model_id = str(config.model_id)
    model_dir = Path(model_id)

    if (model_dir / "config.yaml").exists():
        import yaml

        saved = DictConfig(
            yaml.safe_load((model_dir / "config.yaml").read_text("utf-8"))
        )
        saved.model_dir = str(model_dir)
        # Eval-time generation overrides (the reference's evaluation surface
        # re-decides decoding strategy per run — `no_lm` for wav2vec2,
        # Seq2SeqTrainingArguments.generation_num_beams for whisper,
        # src/coral/whisper.py:221-222 / evaluate.py:142-155).
        for key, model_key in (
            ("generation_num_beams", "generation_num_beams"),
            ("generation_length_penalty", "generation_length_penalty"),
            ("return_timestamps", "return_timestamps"),
            ("generation_max_length", "max_length"),
        ):
            if config.get(key) is not None:
                saved.model[model_key] = config.get(key)
        setup = load_model_setup(saved, is_main=True)
        params = _restore_params(model_dir / "model", setup)
    else:
        # A pretrained checkpoint id: synthesise the minimal training-config
        # surface the setup layer needs.
        train_cfg = DictConfig(
            {
                "model": {
                    "type": "whisper" if "whisper" in model_id.lower()
                    else "wav2vec2",
                    "pretrained_model_id": model_id,
                    "sampling_rate": config.sampling_rate,
                    "characters_to_keep": config.characters_to_keep,
                    "lower_case": config.lower_case,
                    "language": "danish",
                },
                "model_dir": str(
                    Path(config.get("cache_dir") or ".") / "eval-models"
                    / model_id.replace("/", "--")
                ),
                "max_seconds_per_example": config.max_seconds_per_example,
                "bf16_allowed": True,
                "gradient_checkpointing": False,
            }
        )
        setup = load_model_setup(train_cfg, is_main=True)
        params = setup.init_params(jax.random.PRNGKey(0))

    # The eval batch is sharded over the data axis, so the mesh extent must
    # divide batch_size; use the largest qualifying device count.
    n_devices = len(jax.devices())
    batch_size = int(config.batch_size)
    dp = max(d for d in range(1, n_devices + 1) if batch_size % d == 0)
    mesh = create_mesh((dp, 1))
    param_sh = jax.tree.map(lambda _: replicated(mesh), params)
    params = jax.device_put(params, param_sh)

    # Beam search + n-gram LM when a decoder is stored next to the model and
    # `no_lm` is not set (reference: src/coral/evaluate.py:142-155).
    arpa_files = sorted(model_dir.glob("*gram.arpa")) if model_dir.is_dir() else []
    if (
        arpa_files
        and not config.get("no_lm", False)
        and getattr(setup, "model_type", "") == "wav2vec2"
    ):
        logger.info(f"Decoding with the n-gram LM at {arpa_files[-1]}")
        predict = setup.make_beam_predictor(mesh, param_sh, arpa_files[-1])
    else:
        predict = setup.make_predictor(mesh, param_sh)

    geometry = {
        "max_seconds": setup.audio_pad_seconds,
        "sample_rate": int(config.sampling_rate),
    }
    return (lambda batch: predict(params, batch)), geometry


def _restore_params(path: Path, setup: Any):
    """Restore a final-model orbax params checkpoint into the setup's shapes."""
    import jax
    import orbax.checkpoint as ocp

    abstract = jax.eval_shape(
        lambda: setup.init_params(jax.random.PRNGKey(0))
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path.resolve(), abstract)


def bootstrap_interval(
    predictions: list[str],
    labels: list[str],
    metric,
    n_bootstrap: int = 1000,
    seed: int = 4242,
) -> tuple[float, float]:
    """95% bootstrap CI half-width for a corpus metric.

    The reference's published model-card numbers are "1000x bootstrap, 95% CI"
    (reference: ``MODEL_315M_README.md:37``); this reproduces that methodology
    for the evaluation CSVs.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(predictions)
    scores = []
    preds = np.asarray(predictions, dtype=object)
    labs = np.asarray(labels, dtype=object)
    for _ in range(n_bootstrap):
        idx = rng.integers(0, n, n)
        scores.append(metric(predictions=list(preds[idx]),
                             labels=list(labs[idx])))
    lo, hi = np.percentile(scores, [2.5, 97.5])
    return float(lo), float(hi)


def _narrow_to_slice(
    df: "pandas.DataFrame",  # noqa: F821
    slice_spec: dict,
) -> tuple["pandas.DataFrame", bool]:  # noqa: F821
    """Select the rows matching a demographic slice.

    A ``None`` value marginalises over that column. The slice is reported as
    uninformative when any single constraint is vacuous on the frame narrowed
    so far — it either matches nothing or everything (the latter means the
    same numbers already appear in the corresponding marginal row).
    """
    subset = df
    for column, wanted in slice_spec.items():
        if wanted is None:
            continue
        narrowed = subset[subset[column] == wanted]
        if len(narrowed) == 0 or len(narrowed) == len(subset):
            return subset, False
        subset = narrowed
    return subset, True


def get_score_df(
    df: "pandas.DataFrame",  # noqa: F821
    categories: list[str],
    n_bootstrap: int = 0,
) -> "pandas.DataFrame":  # noqa: F821
    """WER/CER over every demographic slice, marginals included.

    Behaviour-compatible with the reference's score grid
    (``src/coral/evaluate.py:161-216``): the cartesian product of every
    category's values plus ``None`` (= marginalise), with vacuous slices
    dropped; one row per informative slice.

    Args:
        n_bootstrap: When > 0, adds 95% bootstrap CI columns for the overall
            (all-None) row, matching the reference's published methodology.
    """
    import pandas as pd

    axis_values = {c: [*df[c].unique().tolist(), None] for c in categories}

    rows = []
    for point in it.product(*axis_values.values()):
        slice_spec = dict(zip(categories, point))
        subset, informative = _narrow_to_slice(df, slice_spec)
        if not informative:
            continue

        hyp = subset.prediction.tolist()
        ref = subset.text.tolist()
        measured = {
            "cer": cer(predictions=hyp, labels=ref),
            "wer": wer(predictions=hyp, labels=ref),
        }
        is_overall = all(v is None for v in point)
        if n_bootstrap and is_overall:
            for name, metric in (("cer", cer), ("wer", wer)):
                lo, hi = bootstrap_interval(
                    hyp, ref, metric, n_bootstrap=n_bootstrap
                )
                measured[f"{name}_ci_low"] = lo
                measured[f"{name}_ci_high"] = hi
        rows.append(slice_spec | measured)

        where = (
            "overall"
            if is_overall
            else " & ".join(
                f"{c}={v}" for c, v in slice_spec.items() if v is not None
            )
        )
        summary = ", ".join(
            f"{name.upper()} {value:.1%}" for name, value in measured.items()
        )
        logger.info(f"[{where}] {summary}")

    return pd.DataFrame.from_records(data=rows)
