"""Sharded checkpointing with best-k retention and resume.

The reference delegates checkpointing to the HF Trainer: ``save_steps=500``,
``save_total_limit``, ``load_best_model_at_end`` with
``metric_for_best_model=val_..._cer`` and ``greater_is_better=False``
(reference: ``src/coral/wav2vec2.py:209-250``), and
``trainer.train(resume_from_checkpoint=...)`` (reference:
``src/coral/finetune.py:79``). The TPU-native equivalent is an orbax
``CheckpointManager`` writing the full sharded train state — ZeRO-sharded optimizer
moments are saved and restored in their sharded layout, so no host gathers happen on
the checkpoint path.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__package__)


class Checkpointer:
    """Step-indexed train-state checkpoints with best-k retention.

    Args:
        directory: Checkpoint root (created if missing).
        save_total_limit: Max checkpoints kept; 0 is promoted to 1 so resume
            always works (the reference promotes 0 to >=1 under early stopping).
        metric_name: Metric key used for "best" ranking (e.g. first val split's
            CER); lower is better, matching the reference's
            ``greater_is_better=False``.
    """

    def __init__(
        self,
        directory: str | Path,
        save_total_limit: int = 1,
        metric_name: str | None = None,
    ) -> None:
        self.directory = Path(directory).resolve()
        self.metric_name = metric_name
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(1, int(save_total_limit)),
            best_fn=(lambda m: m[metric_name]) if metric_name else None,
            best_mode="min",
            create=True,
            enable_async_checkpointing=True,
        )
        self._manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        """Save the train state (async; overlaps with the next train steps)."""
        composite: dict[str, ocp.args.CheckpointArgs] = {
            "state": ocp.args.StandardSave(state)
        }
        if metrics is not None:
            composite["metrics"] = ocp.args.JsonSave(
                {k: float(v) for k, v in metrics.items()}
            )
        self._manager.save(
            step,
            args=ocp.args.Composite(**composite),
            metrics={k: float(v) for k, v in (metrics or {}).items()} or None,
        )

    def latest_step(self) -> int | None:
        return self._manager.latest_step()

    def best_step(self) -> int | None:
        return self._manager.best_step()

    def restore(self, abstract_state: Any, step: int | None = None) -> Any:
        """Restore a checkpoint into the shardings of ``abstract_state``.

        Args:
            abstract_state: A pytree of ``jax.ShapeDtypeStruct`` leaves carrying
                shardings (e.g. from ``jax.eval_shape`` + ``.sharding``), so each
                shard is read straight to its device.
            step: Step to restore; latest if None.
        """
        if step is None:
            step = self._manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        restored = self._manager.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract_state)),
        )
        return restored["state"]

    def wait(self) -> None:
        """Block until any in-flight async save has finished."""
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.wait_until_finished()
        self._manager.close()


def abstract_state_like(state: Any) -> Any:
    """Abstract (shape, dtype, sharding) skeleton of a live state pytree."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state,
    )
