"""Throughput benchmark: wav2vec2-XLS-R-300m CTC fine-tune step on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

The north star (BASELINE.json) is >=2x an A100 running the reference HF/DeepSpeed
stack on the same model. No throughput number is published by the reference, so the
baseline constant below is an engineering estimate of the reference stack's A100
throughput for wav2vec2-300m at batch 64 x <=10s clips (HF Trainer, fp16/bf16,
dataloader-bound): ~600 audio-seconds of training data consumed per second per GPU.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_default_prng_impl", "rbg")  # 10x faster dropout bits

import jax.numpy as jnp
import numpy as np

A100_REFERENCE_AUDIO_SEC_PER_SEC = 600.0

# Bench shape: 32 x 10s clips per step (throughput saturates at B>=32 on v5e).
BATCH = 32
SECONDS = 10
SR = 16_000
ACCUM = 1
LABEL_LEN = 128
VOCAB = 46
WARMUP_STEPS = 3
MEASURE_STEPS = 10


def main() -> None:
    from coral_tpu.models import Wav2Vec2Config, Wav2Vec2ForCTC
    from coral_tpu.parallel import (
        batch_sharding,
        create_mesh,
        replicated,
        zero_shardings,
    )
    from coral_tpu.training import TrainState, create_optimizer
    from coral_tpu.training.train_state import make_ctc_train_step

    devices = jax.devices()
    n_chips = len(devices)
    mesh = create_mesh()

    # Winning v5e configuration (tools/bench_config.py sweep, round 2):
    # pallas short-T attention (lane-sliced heads, no layout copies) +
    # save-matmul-inputs remat + rematted feature encoder + fused dropout +
    # bf16 first Adam moment + fused GELU+dropout + fused feature-encoder
    # LayerNorm+GELU: 537 -> 764 audio-s/s/chip at B=32.
    config = Wav2Vec2Config.xls_r_300m(
        vocab_size=VOCAB, dtype=jnp.bfloat16, attention_impl="pallas"
    )
    model = Wav2Vec2ForCTC(
        config,
        gradient_checkpointing=True,
        remat_policy="save_matmul_inputs",
        remat_feature_encoder=True,
    )

    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng}, jnp.zeros((1, SR)), jnp.asarray([SR])
    )["params"]
    tx, schedule = create_optimizer(
        learning_rate=1e-4, warmup_steps=100, max_steps=100_000,
        mu_dtype="bfloat16",
    )
    state = TrainState.create(params, tx)
    train_step = make_ctc_train_step(
        model, tx, schedule, blank_id=VOCAB - 1, freeze_feature_encoder=False
    )

    param_sh = jax.tree.map(lambda _: replicated(mesh), state.params)
    opt_sh = zero_shardings(state.opt_state, mesh)
    state_sh = TrainState(step=replicated(mesh), params=param_sh, opt_state=opt_sh)
    data_sh = batch_sharding(mesh, axis=1)
    batch_sh = {k: data_sh for k in
                ("input_values", "input_lengths", "labels", "label_lengths")}

    jitted = jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )

    T = SECONDS * SR
    global_batch = BATCH * n_chips
    rng_np = np.random.default_rng(0)
    batch = {
        "input_values": rng_np.standard_normal(
            (ACCUM, global_batch, T)
        ).astype(np.float32),
        "input_lengths": np.full((ACCUM, global_batch), T, dtype=np.int32),
        "labels": rng_np.integers(
            0, VOCAB - 1, size=(ACCUM, global_batch, LABEL_LEN)
        ).astype(np.int32),
        "label_lengths": np.full((ACCUM, global_batch), LABEL_LEN, dtype=np.int32),
    }
    state = jax.device_put(state, state_sh)
    batch = jax.device_put(batch, batch_sh)

    for i in range(WARMUP_STEPS):
        state, metrics = jitted(state, batch, jax.random.PRNGKey(i))
    # Materialise a concrete value: on the axon remote-execution platform,
    # jax.block_until_ready can no-op on enqueued-but-unfinished chains; a host
    # fetch is the only reliable synchronisation point.
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = jitted(state, batch, jax.random.PRNGKey(100 + i))
    final_loss = float(metrics["loss"])  # forces the whole donated-state chain
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    audio_seconds = MEASURE_STEPS * ACCUM * global_batch * SECONDS
    throughput_per_chip = audio_seconds / elapsed / n_chips

    print(
        json.dumps(
            {
                "metric": "wav2vec2-315M CTC finetune throughput",
                "value": round(throughput_per_chip, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(
                    throughput_per_chip / A100_REFERENCE_AUDIO_SEC_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
