"""Whisper seq2seq train-step tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coral_tpu.models.whisper import WhisperConfig, init_whisper_params
from coral_tpu.parallel import batch_sharding, create_mesh, replicated
from coral_tpu.training import TrainState, create_optimizer
from coral_tpu.training.train_state import (
    make_seq2seq_train_step,
    make_whisper_generate_step,
)

VOCAB = 96
SOT, EOT = 90, 91
CHUNK = 16_000  # 1 s


@pytest.fixture(scope="module")
def setup():
    config = WhisperConfig.tiny_test(vocab_size=VOCAB)
    params = init_whisper_params(jax.random.PRNGKey(0), config)
    tx, schedule = create_optimizer(learning_rate=1e-3, warmup_steps=2,
                                    max_steps=20)
    return config, params, tx, schedule


def make_batch(rng, accum, batch, L=12):
    labels = rng.integers(0, 80, size=(accum, batch, L)).astype(np.int32)
    labels[:, :, -1] = EOT
    labels[:, :, -3:-1] = -100  # some padding inside
    return {
        "input_values": rng.standard_normal(
            (accum, batch, CHUNK)
        ).astype(np.float32),
        "input_lengths": np.full((accum, batch), CHUNK, dtype=np.int32),
        "labels": labels,
        "label_lengths": np.full((accum, batch), L, dtype=np.int32),
    }


def test_seq2seq_step_runs_and_loss_decreases(setup):
    config, params, tx, schedule = setup
    mesh = create_mesh()
    step = make_seq2seq_train_step(
        config, tx, schedule, sot_id=SOT, pad_id=EOT, chunk_length=CHUNK,
    )
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    data_sh = batch_sharding(mesh, axis=1)
    batch_sh = {k: data_sh for k in
                ("input_values", "input_lengths", "labels", "label_lengths")}
    jitted = jax.jit(
        step,
        in_shardings=(
            jax.tree.map(lambda _: replicated(mesh), state), batch_sh,
            replicated(mesh),
        ),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(0)
    batch = jax.device_put(make_batch(rng, accum=2, batch=8), batch_sh)
    state = jax.device_put(
        state, jax.tree.map(lambda _: replicated(mesh), state)
    )
    losses = []
    for i in range(6):
        state, metrics = jitted(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # overfits the fixed batch


def test_generate_step_shapes(setup):
    config, params, tx, schedule = setup
    generate = make_whisper_generate_step(
        config, forced_ids=[SOT, 85], max_length=10, eos_id=EOT,
    )
    rng = np.random.default_rng(1)
    batch = {
        "input_values": rng.standard_normal((4, CHUNK)).astype(np.float32),
        "input_lengths": np.full((4,), CHUNK, dtype=np.int32),
    }
    ids = np.asarray(jax.jit(generate)(params, batch))
    assert ids.shape == (4, 10)
    assert (ids[:, 0] == SOT).all() and (ids[:, 1] == 85).all()
