"""Tensor-parallel tests: TP specs, and DP-vs-TP numerical equivalence.

The strongest check: one train step on a (data=2, model=4) mesh must produce
the same loss and parameters as the same step on a pure-DP (8, 1) mesh — the
sharding layout must never change the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from coral_tpu.models import Wav2Vec2Config, Wav2Vec2ForCTC
from coral_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicated,
    tp_shardings,
)
from coral_tpu.training import TrainState, create_optimizer
from coral_tpu.training.train_state import make_ctc_train_step

VOCAB = 12
BLANK = VOCAB - 1


def make_batch(rng, batch, T=6400, L=8):
    return {
        "input_values": rng.standard_normal((1, batch, T)).astype(np.float32),
        "input_lengths": np.full((1, batch), T, dtype=np.int32),
        "labels": rng.integers(0, VOCAB - 1, size=(1, batch, L)).astype(
            np.int32
        ),
        "label_lengths": np.full((1, batch), L, dtype=np.int32),
    }


def run_one_step(mesh, model, params, batch_np, tp: bool):
    tx, schedule = create_optimizer(learning_rate=1e-3, warmup_steps=2,
                                    max_steps=20)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    if tp:
        param_sh = tp_shardings(state.params, mesh)
        opt_sh = tp_shardings(state.opt_state, mesh)
    else:
        param_sh = jax.tree.map(lambda _: replicated(mesh), state.params)
        opt_sh = jax.tree.map(lambda _: replicated(mesh), state.opt_state)
    state_sh = TrainState(step=replicated(mesh), params=param_sh,
                          opt_state=opt_sh)
    data_sh = batch_sharding(mesh, axis=1)
    batch_sh = {k: data_sh for k in batch_np}
    step_fn = make_ctc_train_step(
        model, tx, schedule, blank_id=BLANK, freeze_feature_encoder=True
    )
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        out_shardings=(state_sh, None),
    )
    state = jax.device_put(state, state_sh)
    batch = jax.device_put(batch_np, batch_sh)
    state, metrics = jitted(state, batch, jax.random.PRNGKey(0))
    return float(metrics["loss"]), jax.device_get(state.params)


@pytest.fixture(scope="module")
def setup():
    # SpecAugment/dropout off so DP and TP runs are bit-comparable; dims are
    # divisible by the 4-way model axis.
    config = Wav2Vec2Config(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        conv_dim=(16, 16, 16, 16), conv_stride=(5, 4, 4, 4),
        conv_kernel=(10, 3, 3, 3),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        apply_spec_augment=False, activation_dropout=0.0,
    )
    model = Wav2Vec2ForCTC(config)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 6400)),
        jnp.asarray([6400]),
    )["params"]
    return config, model, params


def test_tp_specs_shard_attention_and_ffn(setup):
    _, _, params = setup
    mesh = create_mesh((2, 4))
    shardings = tp_shardings(params, mesh)
    enc = shardings["wav2vec2"]["encoder"]["layers"]
    # stacked (L, D, D) kernels: q column-parallel, out row-parallel
    assert enc["attention"]["q_proj"]["kernel"].spec == P(None, None, "model")
    assert enc["attention"]["out_proj"]["kernel"].spec == P(None, "model", None)
    assert enc["feed_forward"]["intermediate_dense"]["kernel"].spec == P(
        None, None, "model"
    )
    assert enc["feed_forward"]["output_dense"]["kernel"].spec == P(
        None, "model", None
    )
    # norms replicate
    assert enc["layer_norm"]["scale"].spec == P()
    # the tiny CTC head's vocab dim (12) does not divide 4 -> replicated
    assert shardings["lm_head"]["kernel"].spec == P()


def test_tp_matches_dp_one_step(setup):
    _, model, params = setup
    rng = np.random.default_rng(3)
    batch_np = make_batch(rng, batch=8)

    dp_loss, dp_params = run_one_step(
        create_mesh((8, 1)), model, params, batch_np, tp=False
    )
    tp_loss, tp_params = run_one_step(
        create_mesh((2, 4)), model, params, batch_np, tp=True
    )
    assert np.isfinite(dp_loss)
    np.testing.assert_allclose(tp_loss, dp_loss, rtol=1e-5)
    flat_dp = jax.tree.leaves(dp_params)
    flat_tp = jax.tree.leaves(tp_params)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_tp_specs_for_whisper_params():
    from coral_tpu.models.whisper import WhisperConfig, init_whisper_params

    config = WhisperConfig.tiny_test(vocab_size=64)
    params = init_whisper_params(jax.random.PRNGKey(0), config)
    mesh = create_mesh((2, 4))
    shardings = tp_shardings(params, mesh)
    dec = shardings["decoder"]["layers"]
    assert dec["self_attn"]["q_proj"]["kernel"].spec == P(None, None, "model")
    assert dec["self_attn"]["out_proj"]["kernel"].spec == P(None, "model", None)
    assert dec["encoder_attn"]["k_proj"]["kernel"].spec == P(None, None, "model")
    assert dec["fc1"]["kernel"].spec == P(None, None, "model")
    assert dec["fc2"]["kernel"].spec == P(None, "model", None)
    assert shardings["decoder"]["embed_tokens"].spec == P()
    assert shardings["decoder"]["layer_norm"]["scale"].spec == P()


def test_tp_zero_2d_opt_state_matches_dp(setup):
    """TP params + ZeRO-over-data optimizer state: still DP-equivalent."""
    from coral_tpu.parallel.tp import tp_zero_shardings
    from coral_tpu.training import TrainState as TS

    _, model, params = setup
    rng = np.random.default_rng(5)
    batch_np = make_batch(rng, batch=8)
    dp_loss, dp_params = run_one_step(
        create_mesh((8, 1)), model, params, batch_np, tp=False
    )

    mesh = create_mesh((2, 4))
    tx, schedule = create_optimizer(learning_rate=1e-3, warmup_steps=2,
                                    max_steps=20)
    state = TS.create(jax.tree.map(jnp.copy, params), tx)
    param_sh = tp_shardings(state.params, mesh)
    opt_sh = tp_zero_shardings(state.opt_state, mesh, min_size=128)
    state_sh = TS(step=replicated(mesh), params=param_sh, opt_state=opt_sh)
    data_sh = batch_sharding(mesh, axis=1)
    batch_sh = {k: data_sh for k in batch_np}
    step_fn = make_ctc_train_step(
        model, tx, schedule, blank_id=BLANK, freeze_feature_encoder=True
    )
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        out_shardings=(state_sh, None),
    )
    state = jax.device_put(state, state_sh)
    batch = jax.device_put(batch_np, batch_sh)
    state, metrics = jitted(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]), dp_loss, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(dp_params),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # some Adam moment actually lands on the data axis
    specs = [
        getattr(x.sharding, "spec", P())
        for x in jax.tree.leaves(state.opt_state)
        if hasattr(x, "sharding")
    ]
    assert any("data" in str(s) for s in specs)
