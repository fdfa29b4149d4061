"""Optimizer and LR schedule.

Matches the reference's optimisation setup (reference:
``src/coral/wav2vec2.py:216-240``, ``config/asr_finetuning.yaml``): AdamW with
configurable betas (default 0.9/0.98), linear warmup followed by cosine decay to
zero over ``max_steps``, and global-norm gradient clipping.
"""

from __future__ import annotations

import optax


def create_learning_rate_schedule(
    learning_rate: float, warmup_steps: int, max_steps: int
) -> optax.Schedule:
    """Linear warmup to ``learning_rate``, cosine decay to 0 at ``max_steps``."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=warmup_steps,
        # decay_steps counts warmup too; keep a positive decay phase even for
        # smoke runs with max_steps <= warmup_steps.
        decay_steps=max(max_steps, warmup_steps + 1),
        end_value=0.0,
    )


def create_optimizer(
    learning_rate: float,
    warmup_steps: int,
    max_steps: int,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.98,
    adam_eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float | None = 1.0,
    mu_dtype: str | None = None,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the training optimizer.

    Args:
        mu_dtype: dtype for the first Adam moment (e.g. ``"bfloat16"`` to halve
            its HBM footprint — bf16 keeps the fp32 exponent range, and the
            first moment is a smoothed gradient where 8 mantissa bits are
            plenty). ``None`` keeps the parameter dtype (fp32). The second
            moment stays fp32: it feeds an rsqrt, where mantissa error is
            amplified for tiny values.

    Returns:
        (optimizer, schedule) — the schedule is exposed for logging.
    """
    schedule = create_learning_rate_schedule(learning_rate, warmup_steps, max_steps)
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_eps,
            weight_decay=weight_decay,
            mu_dtype=mu_dtype,
        )
    )
    return optax.chain(*chain), schedule
