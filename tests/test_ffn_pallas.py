"""Tests for the fused FFN up-projection kernel (ops/ffn_pallas.py).

The rate=0 kernels carry no TPU PRNG, so the real Pallas code runs here
under ``interpret=True`` — forward and the full custom-VJP chain are pinned
against the composed-XLA reference. Dropout variants are TPU-only (the
composed fallback covers semantics off-TPU; mask-stream consistency runs in
tools/verify_kernels.py on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coral_tpu.ops.ffn_pallas import (
    _xla_reference,
    _xla_reference_ln,
    ffn_fc1,
    ffn_ln_fc1,
)


def _data(B=2, T=70, D=128, F=256, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype)
    w = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((F,)) * 0.1, jnp.float32)
    return x, w, b


def test_interpret_forward_matches_xla():
    x, w, b = _data()
    got = ffn_fc1(x, w, b, interpret=True)
    ref = _xla_reference(x, w, b, 0.0, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_interpret_forward_ragged_rows():
    # T far from a multiple of the 256-row tile: clipped writes must cover
    # exactly the real rows.
    x, w, b = _data(T=301)
    got = ffn_fc1(x, w, b, interpret=True)
    ref = _xla_reference(x, w, b, 0.0, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_interpret_grads_match_xla():
    x, w, b = _data(T=130)

    def loss(fn):
        def inner(x, w, b):
            y = fn(x, w, b)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got = jax.grad(
        loss(lambda x, w, b: ffn_fc1(x, w, b, interpret=True)),
        argnums=(0, 1, 2),
    )(x, w, b)
    ref = jax.grad(
        loss(lambda x, w, b: _xla_reference(x, w, b, 0.0, None)),
        argnums=(0, 1, 2),
    )(x, w, b)
    for g, r, name in zip(got, ref, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_bf16_path_compiles_and_is_close():
    x, w, b = _data(dtype=jnp.bfloat16)
    got = ffn_fc1(x, w, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _xla_reference(x.astype(jnp.float32), w, b, 0.0, None)
    np.testing.assert_allclose(
        np.asarray(got, jnp.float32), np.asarray(ref), atol=0.05, rtol=0.05
    )


def test_dropout_fallback_statistics():
    x, w, b = _data(T=200)
    y = ffn_fc1(x, w, b, rate=0.25, rng=jax.random.PRNGKey(0))
    kept = np.asarray(y) != 0
    assert abs(kept.mean() - 0.75) < 0.03
    base = np.asarray(_xla_reference(x, w, b, 0.0, None))
    np.testing.assert_allclose(
        np.asarray(y)[kept], (base / 0.75)[kept], rtol=1e-4, atol=1e-5
    )


def test_dropout_fallback_grad_mask_matches_forward():
    x, w, b = _data(T=64)
    key = jax.random.PRNGKey(3)
    y = ffn_fc1(x, w, b, rate=0.5, rng=key)
    dw = jax.grad(
        lambda w: jnp.sum(ffn_fc1(x, w, b, rate=0.5, rng=key))
    )(w)
    assert np.isfinite(np.asarray(dw)).all()
    # Same key -> same mask on the fallback path.
    y2 = ffn_fc1(x, w, b, rate=0.5, rng=key)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_model_param_tree_and_output_parity():
    """fused_ffn=True keeps the exact nn.Dense param tree and matches the
    unfused FFN output when dropout is off. The unfused model path keeps
    exact ``jax.nn.gelu`` (HF-parity numerics), the fused path evaluates the
    selected polynomial tables, so the cross-path tolerance is the
    documented poly bound (short: max |err| 1.85e-4) amplified by the fc2
    contraction (F=256 correlated pointwise errors), not f32 epsilon."""
    from coral_tpu.models.wav2vec2 import FeedForward, Wav2Vec2Config

    cfg_args = dict(hidden_size=128, intermediate_size=256)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 20, 128)), jnp.float32
    )
    outs, params = [], []
    for fused in (False, True):
        cfg = Wav2Vec2Config(fused_ffn=fused, **cfg_args)
        mod = FeedForward(cfg)
        p = mod.init(jax.random.PRNGKey(0), x, True)
        params.append(p)
        outs.append(mod.apply(p, x, True))
    assert jax.tree_util.tree_structure(params[0]) == (
        jax.tree_util.tree_structure(params[1])
    )
    for a, b in zip(jax.tree_util.tree_leaves(params[0]),
                    jax.tree_util.tree_leaves(params[1])):
        assert a.shape == b.shape and a.dtype == b.dtype
    np.testing.assert_allclose(
        np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-3
    )


def test_encoder_layer_fused_ffn_ln_parity():
    """fused_ffn_ln keeps the nn.LayerNorm tree path and matches the
    unfused encoder layer, forward and grads (training mode: the off-TPU
    dropout fallbacks draw the same jax.random masks from the same key)."""
    from coral_tpu.models.wav2vec2 import EncoderLayer, Wav2Vec2Config

    base = dict(
        hidden_size=128, intermediate_size=256, num_attention_heads=2,
        attention_impl="xla", encoder_ln_impl="xla", hidden_dropout=0.0,
        activation_dropout=0.1,
    )
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 24, 128)), jnp.float32
    )
    mask = jnp.ones((2, 24), bool)
    outs, params = [], []
    for fused in (False, True):
        cfg = Wav2Vec2Config(fused_ffn=fused, fused_ffn_ln=fused, **base)
        mod = EncoderLayer(cfg)
        p = mod.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, mask, False,
        )
        params.append(p)

        def loss(p, mod=mod):
            y, _ = mod.apply(p, x, mask, False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(y * jnp.sin(jnp.arange(y.shape[-1]))), y

        (val, y), grads = jax.value_and_grad(loss, has_aux=True)(p)
        outs.append((y, grads))
    assert jax.tree_util.tree_structure(params[0]) == (
        jax.tree_util.tree_structure(params[1])
    )
    # Cross-path (poly vs exact-GELU) forward/grad tolerances follow the
    # documented short-table bound through the fc2 contraction; see
    # test_model_param_tree_and_output_parity.
    np.testing.assert_allclose(
        np.asarray(outs[0][0]), np.asarray(outs[1][0]), atol=1e-3
    )
    flat0 = jax.tree_util.tree_leaves_with_path(outs[0][1])
    flat1 = jax.tree_util.tree_leaves_with_path(outs[1][1])
    for (p0, g0), (p1, g1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1), atol=2e-3, rtol=1e-4,
            err_msg=jax.tree_util.keystr(p0),
        )


def _ln_data(B=2, T=70, D=128, F=256, seed=4):
    rng = np.random.default_rng(seed)
    x, w, b = _data(B, T, D, F, jnp.float32, seed)
    gamma = jnp.asarray(rng.standard_normal(D) * 0.2 + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(D) * 0.2, jnp.float32)
    return x, w, b, gamma, beta


def test_ln_interpret_forward_matches_xla():
    x, w, b, gamma, beta = _ln_data(T=301)  # ragged last row-tile
    got = ffn_ln_fc1(x, w, b, gamma, beta, interpret=True)
    ref = _xla_reference_ln(x, w, b, gamma, beta, 0.0, None, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ln_interpret_grads_match_xla():
    x, w, b, gamma, beta = _ln_data(T=130)

    def loss(fn):
        def inner(x, w, b, gamma, beta):
            y = fn(x, w, b, gamma, beta)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got = jax.grad(
        loss(lambda *a: ffn_ln_fc1(*a, interpret=True)),
        argnums=(0, 1, 2, 3, 4),
    )(x, w, b, gamma, beta)
    ref = jax.grad(
        loss(lambda *a: _xla_reference_ln(*a, 0.0, None, 1e-5)),
        argnums=(0, 1, 2, 3, 4),
    )(x, w, b, gamma, beta)
    for g, r, name in zip(got, ref, "x w b gamma beta".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_ln_custom_eps_respected():
    x, w, b, gamma, beta = _ln_data()
    got = ffn_ln_fc1(x, w, b, gamma, beta, eps=1e-2, interpret=True)
    ref = _xla_reference_ln(x, w, b, gamma, beta, 0.0, None, 1e-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    bad = _xla_reference_ln(x, w, b, gamma, beta, 0.0, None, 1e-5)
    assert np.abs(np.asarray(got) - np.asarray(bad)).max() > 1e-4


def test_ln_tensor_parallel_grads_match_single_device():
    """Column-sharded W1: dx AND dgamma/dbeta pick up the model-axis psum."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.device_count() < 2:
        pytest.skip("needs the 8-device CPU mesh")
    x, w, b, gamma, beta = _ln_data(T=96)

    def loss(x, w, b, gamma, beta):
        return jnp.sum(jnp.abs(ffn_ln_fc1(x, w, b, gamma, beta,
                                          interpret=True)))

    ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    bs = jax.device_put(b, NamedSharding(mesh, P("model")))
    xs = jax.device_put(x, NamedSharding(mesh, P()))
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        xs, ws, bs, gamma, beta
    )
    for g, r, name in zip(got, ref, "x w b gamma beta".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_whisper_fused_ffn_parity():
    """fused_ffn=True leaves the whisper train forward unchanged (off-TPU
    both paths draw the same jax.random dropout mask from the same key)."""
    import dataclasses

    from coral_tpu.models.whisper import (
        WhisperConfig,
        forward,
        init_whisper_params,
    )

    cfg = WhisperConfig.tiny_test(vocab_size=64, max_source_positions=100)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(
        rng.standard_normal((2, 200, cfg.num_mel_bins)), jnp.float32
    )
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 9)), jnp.int32)
    outs = []
    for fused, fused_ln, block in (
        (False, False, False), (True, False, False), (True, True, False),
        (True, True, True),
    ):
        c = dataclasses.replace(cfg, fused_ffn=fused, fused_ffn_ln=fused_ln,
                                fused_ffn_block=block)
        outs.append(
            forward(params, c, mel, ids, deterministic=False,
                    rng=jax.random.PRNGKey(7))
        )
    for other in outs[1:]:
        np.testing.assert_allclose(
            np.asarray(outs[0]), np.asarray(other), atol=2e-5
        )


def test_sharded_grads_match_single_device():
    """Batch-sharded fused op == unsharded (custom_partitioning psum on
    dw/db)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.device_count() < 4:
        pytest.skip("needs the 8-device CPU mesh")
    x, w, b = _data(B=4, T=96)

    def loss(x, w, b):
        return jnp.sum(jnp.abs(ffn_fc1(x, w, b, interpret=True)))

    ref = jax.grad(loss, argnums=(1, 2))(x, w, b)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(jax.grad(loss, argnums=(1, 2)))(xs, w, b)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-4
        )


def test_tensor_parallel_grads_match_single_device():
    """Column-sharded W1 (TP): the in-kernel dx picks up the model-axis psum
    in the partition lowering."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.device_count() < 2:
        pytest.skip("needs the 8-device CPU mesh")
    x, w, b = _data(B=2, T=96)

    def loss(x, w, b):
        return jnp.sum(jnp.abs(ffn_fc1(x, w, b, interpret=True)))

    ref = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    bs = jax.device_put(b, NamedSharding(mesh, P("model")))
    xs = jax.device_put(x, NamedSharding(mesh, P()))
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xs, ws, bs)
    for g, r, name in zip(got, ref, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def _lnmm_xla(x, w, b, gamma, beta, eps=1e-5):
    from coral_tpu.ops.ffn_pallas import _xla_ln

    h = jax.lax.dot_general(
        _xla_ln(x, gamma, beta, eps), w.astype(x.dtype),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    return h.astype(x.dtype)


def test_ln_dense_interpret_forward_matches_xla():
    from coral_tpu.ops.ffn_pallas import ln_dense

    x, w, b, gamma, beta = _ln_data(T=301)  # ragged last row-tile
    got = ln_dense(x, w, b, gamma, beta, interpret=True)
    ref = _lnmm_xla(x, w, b, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ln_dense_interpret_grads_match_xla():
    from coral_tpu.ops.ffn_pallas import ln_dense

    x, w, b, gamma, beta = _ln_data(T=130)

    def loss(fn):
        def inner(x, w, b, gamma, beta):
            y = fn(x, w, b, gamma, beta)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got = jax.grad(
        loss(lambda *a: ln_dense(*a, interpret=True)),
        argnums=(0, 1, 2, 3, 4),
    )(x, w, b, gamma, beta)
    ref = jax.grad(loss(_lnmm_xla), argnums=(0, 1, 2, 3, 4))(
        x, w, b, gamma, beta
    )
    for g, r, name in zip(got, ref, "x w b gamma beta".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_ln_dense_custom_eps_respected():
    from coral_tpu.ops.ffn_pallas import ln_dense

    x, w, b, gamma, beta = _ln_data()
    got = ln_dense(x, w, b, gamma, beta, eps=1e-2, interpret=True)
    ref = _lnmm_xla(x, w, b, gamma, beta, eps=1e-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    bad = _lnmm_xla(x, w, b, gamma, beta, eps=1e-5)
    assert np.abs(np.asarray(got) - np.asarray(bad)).max() > 1e-4


def test_ln_dense_tensor_parallel_grads_match_single_device():
    """Column-sharded W (packed QKV under TP): dx and dgamma/dbeta pick up
    the model-axis psum inside the lowering."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from coral_tpu.ops.ffn_pallas import ln_dense

    if jax.device_count() < 2:
        pytest.skip("needs the 8-device CPU mesh")
    x, w, b, gamma, beta = _ln_data(T=96)

    def loss(x, w, b, gamma, beta):
        return jnp.sum(jnp.abs(ln_dense(x, w, b, gamma, beta,
                                        interpret=True)))

    ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
    bs = jax.device_put(b, NamedSharding(mesh, P("model")))
    xs = jax.device_put(x, NamedSharding(mesh, P()))
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        xs, ws, bs, gamma, beta
    )
    for g, r, name in zip(got, ref, "x w b gamma beta".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_encoder_layer_fused_qkv_ln_parity():
    """fused_qkv_ln keeps the nn.Dense/nn.LayerNorm tree paths and matches
    the unfused encoder layer, forward and grads."""
    from coral_tpu.models.wav2vec2 import EncoderLayer, Wav2Vec2Config

    base = dict(
        hidden_size=128, intermediate_size=256, num_attention_heads=2,
        attention_impl="xla", encoder_ln_impl="xla", hidden_dropout=0.0,
        activation_dropout=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 24, 128)), jnp.float32
    )
    mask = jnp.ones((2, 24), bool)
    outs, params = [], []
    for fused in (False, True):
        cfg = Wav2Vec2Config(fused_qkv_ln=fused, **base)
        mod = EncoderLayer(cfg)
        p = mod.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, mask, False,
        )
        params.append(p)

        def loss(p, mod=mod):
            y, _ = mod.apply(p, x, mask, False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(y * jnp.sin(jnp.arange(y.shape[-1]))), y

        (val, y), grads = jax.value_and_grad(loss, has_aux=True)(p)
        outs.append((y, grads))
    assert jax.tree_util.tree_structure(params[0]) == (
        jax.tree_util.tree_structure(params[1])
    )
    np.testing.assert_allclose(
        np.asarray(outs[0][0]), np.asarray(outs[1][0]), atol=2e-5
    )
    flat0 = jax.tree_util.tree_leaves_with_path(outs[0][1])
    flat1 = jax.tree_util.tree_leaves_with_path(outs[1][1])
    for (p0, g0), (p1, g1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1), atol=5e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(p0),
        )


# ---------------------------------------------------------------------------
# Whole-FFN block (ffn_block / ffn_ln_block): fc1 kernel + fc2 in one
# custom_vjp — the backward emits g itself, so no forward replay is needed.
# ---------------------------------------------------------------------------


def _block_data(B=2, T=70, D=128, F=256, seed=11):
    rng = np.random.default_rng(seed)
    x, w1, b1, gamma, beta = _ln_data(B, T, D, F, seed)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)
    return x, w1, b1, gamma, beta, w2, b2


def _block_ref(x, w1, b1, gamma, beta, w2, b2, eps=1e-5):
    from coral_tpu.ops.ffn_pallas import _fc2

    return _fc2(_xla_reference_ln(x, w1, b1, gamma, beta, 0.0, None, eps),
                w2, b2)


def test_block_interpret_forward_matches_xla():
    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    x, w1, b1, gamma, beta, w2, b2 = _block_data(T=301)  # ragged last tile
    got = ffn_ln_block(x, w1, b1, gamma, beta, w2, b2, interpret=True)
    ref = _block_ref(x, w1, b1, gamma, beta, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_block_interpret_grads_match_xla():
    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    x, w1, b1, gamma, beta, w2, b2 = _block_data(T=130)

    def loss(fn):
        def inner(*a):
            y = fn(*a)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got = jax.grad(
        loss(lambda *a: ffn_ln_block(*a, interpret=True)),
        argnums=tuple(range(7)),
    )(x, w1, b1, gamma, beta, w2, b2)
    ref = jax.grad(loss(_block_ref), argnums=tuple(range(7)))(
        x, w1, b1, gamma, beta, w2, b2
    )
    for g, r, name in zip(got, ref, "x w1 b1 gamma beta w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_block_dw_in_kernel_grads_match_xla():
    """dw_in_kernel=True (dW1/dW2 accumulated in VMEM-resident blocks
    across the grid) must match the composed reference on all 7 grads,
    including ragged last blocks feeding the accumulators."""
    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    x, w1, b1, gamma, beta, w2, b2 = _block_data(T=301, seed=14)

    def loss(fn):
        def inner(*a):
            y = fn(*a)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got = jax.grad(
        loss(lambda *a: ffn_ln_block(*a, interpret=True, dw_in_kernel=True)),
        argnums=tuple(range(7)),
    )(x, w1, b1, gamma, beta, w2, b2)
    ref = jax.grad(loss(_block_ref), argnums=tuple(range(7)))(
        x, w1, b1, gamma, beta, w2, b2
    )
    for g, r, name in zip(got, ref, "x w1 b1 gamma beta w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_block_noln_interpret_grads_match_xla():
    from coral_tpu.ops.ffn_pallas import _fc2, ffn_block

    x, w1, b1, _, _, w2, b2 = _block_data(T=130, seed=12)

    def loss(fn):
        def inner(*a):
            y = fn(*a)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got = jax.grad(
        loss(lambda *a: ffn_block(*a, interpret=True)),
        argnums=tuple(range(5)),
    )(x, w1, b1, w2, b2)
    ref = jax.grad(
        loss(lambda x, w1, b1, w2, b2: _fc2(
            _xla_reference(x, w1, b1, 0.0, None), w2, b2)),
        argnums=tuple(range(5)),
    )(x, w1, b1, w2, b2)
    for g, r, name in zip(got, ref, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_encoder_layer_fused_ffn_block_parity():
    """fused_ffn_block keeps the nn.Dense/LayerNorm tree paths and matches
    the fused_ffn_ln encoder layer, forward and grads (training mode)."""
    from coral_tpu.models.wav2vec2 import EncoderLayer, Wav2Vec2Config

    base = dict(
        hidden_size=128, intermediate_size=256, num_attention_heads=2,
        attention_impl="xla", encoder_ln_impl="xla", hidden_dropout=0.0,
        activation_dropout=0.1, fused_ffn=True, fused_ffn_ln=True,
    )
    x = jnp.asarray(
        np.random.default_rng(13).standard_normal((2, 24, 128)), jnp.float32
    )
    mask = jnp.ones((2, 24), bool)
    outs, params = [], []
    for block in (False, True):
        cfg = Wav2Vec2Config(fused_ffn_block=block, **base)
        mod = EncoderLayer(cfg)
        p = mod.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, mask, False,
        )
        params.append(p)

        def loss(p, mod=mod):
            y, _ = mod.apply(p, x, mask, False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(y * jnp.sin(jnp.arange(y.shape[-1]))), y

        (val, y), grads = jax.value_and_grad(loss, has_aux=True)(p)
        outs.append((y, grads))
    assert jax.tree_util.tree_structure(params[0]) == (
        jax.tree_util.tree_structure(params[1])
    )
    np.testing.assert_allclose(
        np.asarray(outs[0][0]), np.asarray(outs[1][0]), atol=2e-5
    )
    flat0 = jax.tree_util.tree_leaves_with_path(outs[0][1])
    flat1 = jax.tree_util.tree_leaves_with_path(outs[1][1])
    for (p0, g0), (p1, g1) in zip(flat0, flat1):
        assert p0 == p1
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(g1), atol=5e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(p0),
        )


def test_block_tensor_parallel_grads_match_single_device():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    x, w1, b1, gamma, beta, w2, b2 = _block_data(B=4, T=70)

    def loss(x, w1, b1, gamma, beta, w2, b2):
        return jnp.sum(jnp.abs(ffn_ln_block(
            x, w1, b1, gamma, beta, w2, b2, interpret=True)))

    ref = jax.grad(loss, argnums=tuple(range(7)))(
        x, w1, b1, gamma, beta, w2, b2
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
    b1s = jax.device_put(b1, NamedSharding(mesh, P("model")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("model", None)))
    b2s = jax.device_put(b2, NamedSharding(mesh, P()))
    xs = jax.device_put(x, NamedSharding(mesh, P()))
    with mesh:
        got = jax.jit(jax.grad(loss, argnums=tuple(range(7))))(
            xs, w1s, b1s, gamma, beta, w2s, b2s
        )
    for g, r, name in zip(got, ref, "x w1 b1 gamma beta w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_block_fc2_in_kernel_matches_composed():
    """fc2_in_kernel=True (the whole FFN forward as one kernel) must match
    the composed reference bit-for-bit in spirit: same bf16 g cast before
    the fc2 matmul, and all 7 grads through the shared block backward."""
    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    x, w1, b1, gamma, beta, w2, b2 = _block_data(T=301, seed=15)
    got = ffn_ln_block(x, w1, b1, gamma, beta, w2, b2, interpret=True,
                       fc2_in_kernel=True)
    ref = _block_ref(x, w1, b1, gamma, beta, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def loss(fn):
        def inner(*a):
            y = fn(*a)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got_g = jax.grad(
        loss(lambda *a: ffn_ln_block(*a, interpret=True,
                                     fc2_in_kernel=True)),
        argnums=tuple(range(7)),
    )(x, w1, b1, gamma, beta, w2, b2)
    ref_g = jax.grad(loss(_block_ref), argnums=tuple(range(7)))(
        x, w1, b1, gamma, beta, w2, b2
    )
    for g, r, name in zip(got_g, ref_g, "x w1 b1 gamma beta w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_block_fc2_tensor_parallel_matches_single_device():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    x, w1, b1, gamma, beta, w2, b2 = _block_data(B=4, T=70, seed=16)

    def fwd(x, w1, b1, gamma, beta, w2, b2):
        return ffn_ln_block(x, w1, b1, gamma, beta, w2, b2, interpret=True,
                            fc2_in_kernel=True)

    ref = fwd(x, w1, b1, gamma, beta, w2, b2)
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
    b1s = jax.device_put(b1, NamedSharding(mesh, P("model")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("model", None)))
    with mesh:
        got = jax.jit(fwd)(x, w1s, b1s, gamma, beta, w2s, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_block_dg_in_kernel_grads_match_xla():
    """dg_in_kernel=True (the fc2 cotangent computed inside the backward
    kernel) must match the composed reference on all 7 grads."""
    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    x, w1, b1, gamma, beta, w2, b2 = _block_data(T=301, seed=17)

    def loss(fn):
        def inner(*a):
            y = fn(*a)
            return jnp.sum(y * jnp.cos(jnp.arange(y.shape[-1])))
        return inner

    got = jax.grad(
        loss(lambda *a: ffn_ln_block(*a, interpret=True, dg_in_kernel=True)),
        argnums=tuple(range(7)),
    )(x, w1, b1, gamma, beta, w2, b2)
    ref = jax.grad(loss(_block_ref), argnums=tuple(range(7)))(
        x, w1, b1, gamma, beta, w2, b2
    )
    for g, r, name in zip(got, ref, "x w1 b1 gamma beta w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_block_dg_tensor_parallel_grads_match_single_device():
    """dg_in_kernel under TP: the in-kernel dg contraction is over the
    unsharded D, so per-shard dg is the local F slice; grads must match
    the single-device run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from coral_tpu.ops.ffn_pallas import ffn_ln_block

    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    x, w1, b1, gamma, beta, w2, b2 = _block_data(B=4, T=70, seed=18)

    def loss(x, w1, b1, gamma, beta, w2, b2):
        return jnp.sum(jnp.abs(ffn_ln_block(
            x, w1, b1, gamma, beta, w2, b2, interpret=True,
            dg_in_kernel=True)))

    ref = jax.grad(loss, argnums=tuple(range(7)))(
        x, w1, b1, gamma, beta, w2, b2
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
    b1s = jax.device_put(b1, NamedSharding(mesh, P("model")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("model", None)))
    xs = jax.device_put(x, NamedSharding(mesh, P()))
    with mesh:
        got = jax.jit(jax.grad(loss, argnums=tuple(range(7))))(
            xs, w1s, b1s, gamma, beta, w2s, b2
        )
    for g, r, name in zip(got, ref, "x w1 b1 gamma beta w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4,
            err_msg=f"d{name}",
        )
