"""Tests for the fused short-T attention kernel (ops/attention_pallas.py).

The kernel replaces torch SDPA inside HF ``Wav2Vec2ForCTC`` (reference:
``src/coral/wav2vec2.py:104-126``); these tests pin it against the XLA
reference path for values, gradients, padding semantics and GSPMD
partitioning (no batch all-gather on a sharded mesh).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coral_tpu.ops.attention_pallas import short_t_attention


def _xla_reference(q, k, v, pad_mask):
    bias = jnp.where(pad_mask[:, None, None, :], 0.0, -jnp.inf).astype(
        jnp.float32
    )
    return jax.nn.dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        bias=bias,
    ).astype(q.dtype)


@pytest.fixture()
def qkv():
    B, T, H, d = 2, 56, 4, 16
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((B, T, H, d)), jnp.float32
    )
    lengths = jnp.asarray([56, 37])
    pad = jnp.arange(T)[None, :] < lengths[:, None]
    return mk(), mk(), mk(), pad


def test_forward_matches_xla(qkv):
    q, k, v, pad = qkv
    out = short_t_attention(q, k, v, pad)
    ref = _xla_reference(q, k, v, pad)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_gradients_match_xla(qkv):
    q, k, v, pad = qkv

    def loss(fn, q, k, v):
        out = fn(q, k, v, pad) if fn is short_t_attention else fn(q, k, v)
        return jnp.sum(jnp.sin(out) * jnp.cos(q))

    g_pal = jax.grad(
        lambda q, k, v: loss(short_t_attention, q, k, v), argnums=(0, 1, 2)
    )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: loss(lambda a, b, c: _xla_reference(a, b, c, pad),
                             q, k, v),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_save_stats_variant_matches_plain(qkv):
    """The lse-residual variant must match the stats-free kernel exactly on
    values and the XLA path on gradients (the bwd rebuilds p = exp(s - lse)
    in one pass instead of recomputing max/sum/divide)."""
    q, k, v, pad = qkv
    out = short_t_attention(q, k, v, pad, save_stats=True)
    ref = _xla_reference(q, k, v, pad)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v)) * jnp.cos(q))

    g_stats = jax.grad(
        lambda q, k, v: loss(
            lambda a, b, c: short_t_attention(a, b, c, pad, save_stats=True),
            q, k, v,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: loss(lambda a, b, c: _xla_reference(a, b, c, pad),
                             q, k, v),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_stats, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_save_stats_v2_variant_matches_plain(qkv):
    """The v2 stats variant (normal-space forward + in-register lse
    relayout, v1 transposed-space backward) must match the stats-free kernel
    on values and the XLA path on gradients."""
    q, k, v, pad = qkv
    out = short_t_attention(q, k, v, pad, save_stats="v2")
    ref = _xla_reference(q, k, v, pad)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v)) * jnp.cos(q))

    g_stats = jax.grad(
        lambda q, k, v: loss(
            lambda a, b, c: short_t_attention(a, b, c, pad, save_stats="v2"),
            q, k, v,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: loss(lambda a, b, c: _xla_reference(a, b, c, pad),
                             q, k, v),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_stats, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_save_stats_v3_variant_matches_plain(qkv):
    """The v3 stats variant (v2's forward; backward reads the o residual for
    the flash delta = rowsum(do * o) identity instead of the (T, T)
    sum(p * dp) pass) must match the stats-free kernel on values and the XLA
    path on gradients."""
    q, k, v, pad = qkv
    out = short_t_attention(q, k, v, pad, save_stats="v3")
    ref = _xla_reference(q, k, v, pad)
    np.testing.assert_allclose(out, ref, atol=1e-5)

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v)) * jnp.cos(q))

    g_stats = jax.grad(
        lambda q, k, v: loss(
            lambda a, b, c: short_t_attention(a, b, c, pad, save_stats="v3"),
            q, k, v,
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: loss(lambda a, b, c: _xla_reference(a, b, c, pad),
                             q, k, v),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(g_stats, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_save_stats_v3_fully_masked_row_grads():
    """v3 inherits v2's lse clamp AND its delta comes from o = 0 rows: a
    fully-masked row yields p = 0 and delta = 0 (zero grads); valid rows
    keep exact parity with the stats-free kernel."""
    B, T, H, d = 2, 16, 2, 8
    rng = np.random.default_rng(11)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
        for _ in range(3)
    )
    pad = jnp.asarray([[True] * T, [False] * T])
    out = short_t_attention(q, k, v, pad, save_stats="v3")
    assert np.all(np.isfinite(np.asarray(out)))
    stats = lambda q, k, v: short_t_attention(  # noqa: E731
        q, k, v, pad, save_stats="v3"
    )
    plain = lambda q, k, v: short_t_attention(q, k, v, pad)  # noqa: E731
    for arg in (0, 1, 2):
        def gr(fn, a=arg):
            return jax.grad(
                lambda x: jnp.sum(
                    fn(x if a == 0 else q, x if a == 1 else k,
                       x if a == 2 else v)
                )
            )((q, k, v)[a])
        g_stats = np.asarray(gr(stats))
        np.testing.assert_allclose(g_stats[0], np.asarray(gr(plain))[0],
                                   atol=1e-5)
        assert np.all(g_stats[1] == 0.0)


def test_save_stats_v2_fully_masked_row_grads():
    """The v2 forward carries the same lse clamp as v1: a fully-masked row
    yields p = 0 (zero grads) in the backward, valid rows exact parity."""
    B, T, H, d = 2, 16, 2, 8
    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
        for _ in range(3)
    )
    pad = jnp.asarray([[True] * T, [False] * T])
    out = short_t_attention(q, k, v, pad, save_stats="v2")
    assert np.all(np.isfinite(np.asarray(out)))
    stats = lambda q, k, v: short_t_attention(  # noqa: E731
        q, k, v, pad, save_stats="v2"
    )
    plain = lambda q, k, v: short_t_attention(q, k, v, pad)  # noqa: E731
    for arg in (0, 1, 2):
        def gr(fn, a=arg):
            return jax.grad(
                lambda x: jnp.sum(
                    fn(x if a == 0 else q, x if a == 1 else k,
                       x if a == 2 else v)
                )
            )((q, k, v)[a])
        g_stats = np.asarray(gr(stats))
        np.testing.assert_allclose(g_stats[0], np.asarray(gr(plain))[0],
                                   atol=1e-5)
        assert np.all(g_stats[1] == 0.0)


def test_save_stats_fully_masked_row_grads():
    """A fully-masked row (eval dummy) must not poison gradients: the saved
    lse is clamped so the backward's exp(s + bias - lse) underflows to
    p = 0 there (naive lse would cancel against the -1e30 bias and give
    p = 1 — T-times-inflated dv). Valid rows must still match the plain
    kernel exactly."""
    B, T, H, d = 2, 16, 2, 8
    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
        for _ in range(3)
    )
    pad = jnp.asarray([[True] * T, [False] * T])
    out = short_t_attention(q, k, v, pad, save_stats=True)
    assert np.all(np.isfinite(np.asarray(out)))

    def gr(fn, arg):
        return jax.grad(
            lambda a: jnp.sum(
                fn(a if arg == 0 else q, a if arg == 1 else k,
                   a if arg == 2 else v)
            )
        )((q, k, v)[arg])

    stats = lambda q, k, v: short_t_attention(  # noqa: E731
        q, k, v, pad, save_stats=True
    )
    plain = lambda q, k, v: short_t_attention(q, k, v, pad)  # noqa: E731
    for arg in (0, 1, 2):
        g_stats = np.asarray(gr(stats, arg))
        g_plain = np.asarray(gr(plain, arg))
        assert np.all(np.isfinite(g_stats))
        # Valid batch row: exact parity with the stats-free kernel.
        np.testing.assert_allclose(g_stats[0], g_plain[0], atol=1e-5)
    # The masked row's gradients must be exactly zero in the stats kernel
    # (p = 0 everywhere there — the plain kernel gives uniform-garbage ones).
    for arg in (0, 1, 2):
        assert np.all(np.asarray(gr(stats, arg))[1] == 0.0)


def test_qkv_bias_in_kernel_matches_bias_outside(qkv):
    """attention_fused_qkv_bias: the kernel applied to bias-free projections
    plus in-kernel (D,) biases must match the plain v3 kernel applied to
    biased projections — on values, q/k/v grads, AND the bias grads (which
    the qb backward emits as in-register row sums instead of XLA reducing
    the (B, T, D) cotangents from HBM)."""
    from coral_tpu.ops.attention_pallas import short_t_attention_flat

    q, k, v, pad = qkv
    B, T, H, d = q.shape
    D = H * d
    qf, kf, vf = (x.reshape(B, T, D) for x in (q, k, v))
    rng = np.random.default_rng(9)
    bq, bk, bv = (
        jnp.asarray(rng.standard_normal(D), jnp.float32) for _ in range(3)
    )

    def ref_fn(qf, kf, vf, bq, bk, bv):
        return short_t_attention_flat(
            qf + bq, kf + bk, vf + bv, pad, d, save_stats="v3"
        )

    def qb_fn(qf, kf, vf, bq, bk, bv):
        return short_t_attention_flat(
            qf, kf, vf, pad, d, save_stats="v3", qkv_bias=(bq, bk, bv)
        )

    out_qb = qb_fn(qf, kf, vf, bq, bk, bv)
    out_ref = ref_fn(qf, kf, vf, bq, bk, bv)
    np.testing.assert_allclose(out_qb, out_ref, atol=1e-5)

    def loss(fn, *args):
        return jnp.sum(jnp.sin(fn(*args)) * jnp.cos(args[0]))

    g_qb = jax.grad(
        lambda *a: loss(qb_fn, *a), argnums=tuple(range(6))
    )(qf, kf, vf, bq, bk, bv)
    g_ref = jax.grad(
        lambda *a: loss(ref_fn, *a), argnums=tuple(range(6))
    )(qf, kf, vf, bq, bk, bv)
    for a, b in zip(g_qb, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_encoder_layer_fused_qkv_bias_parity():
    """attention_fused_qkv_bias keeps the nn.Dense tree paths and matches
    the plain encoder layer (same params), forward and grads — including
    the q/k/v projection bias grads, which the qb kernel emits in-register."""
    from coral_tpu.models.wav2vec2 import EncoderLayer, Wav2Vec2Config

    base = dict(
        hidden_size=128, intermediate_size=256, num_attention_heads=2,
        attention_impl="pallas", attention_save_stats="v3",
        encoder_ln_impl="xla", hidden_dropout=0.0, activation_dropout=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 24, 128)), jnp.float32
    )
    mask = jnp.ones((2, 24), bool)
    outs, params = [], []
    for qb in (False, True):
        cfg = Wav2Vec2Config(attention_fused_qkv_bias=qb, **base)
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


def test_qkv_bias_misconfiguration_raises():
    """attention_fused_qkv_bias without its prerequisites (pallas + v3
    stats) or combined with fused_qkv_ln must fail loudly, not silently
    run the unfused path."""
    import pytest

    from coral_tpu.models.wav2vec2 import EncoderLayer, Wav2Vec2Config

    base = dict(
        hidden_size=128, intermediate_size=256, num_attention_heads=2,
        encoder_ln_impl="xla", hidden_dropout=0.0, activation_dropout=0.0,
    )
    x = jnp.zeros((1, 8, 128), jnp.float32)
    mask = jnp.ones((1, 8), bool)
    bad = [
        dict(attention_fused_qkv_bias=True, attention_impl="xla"),
        dict(attention_fused_qkv_bias=True, attention_impl="pallas",
             attention_save_stats="v2"),
        dict(attention_fused_qkv_bias=True, attention_impl="pallas",
             attention_save_stats="v3", fused_qkv_ln=True),
    ]
    for kw in bad:
        cfg = Wav2Vec2Config(**base, **kw)
        mod = EncoderLayer(cfg)
        with pytest.raises(ValueError):
            mod.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                x, mask, False,
            )


def test_padding_is_ignored(qkv):
    """Values beyond a row's length must not influence its output."""
    q, k, v, pad = qkv
    out = short_t_attention(q, k, v, pad)
    k2 = k.at[1, 37:].set(1e4)
    v2 = v.at[1, 37:].set(-1e4)
    out2 = short_t_attention(q, k2, v2, pad)
    np.testing.assert_allclose(out, out2, atol=1e-6)


def test_odd_time_and_head_dims():
    """Non-tile-aligned T and small d still lower (trailing full-array dims)."""
    B, T, H, d = 3, 23, 2, 8
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
        for _ in range(3)
    )
    pad = jnp.ones((B, T), bool)
    out = short_t_attention(q, k, v, pad)
    ref = _xla_reference(q, k, v, pad)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_batch_no_allgather():
    """Under a batch-sharded pjit, the kernel partitions instead of gathering."""
    from coral_tpu.parallel import batch_sharding, create_mesh

    mesh = create_mesh()
    B, T, H, d = 16, 24, 2, 8
    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
        for _ in range(3)
    )
    pad = jnp.ones((B, T), bool)
    sh = batch_sharding(mesh, axis=0)

    fn = jax.jit(
        lambda q, k, v, pad: short_t_attention(q, k, v, pad),
        in_shardings=(sh, sh, sh, sh),
    )
    hlo = fn.lower(q, k, v, pad).compile().as_text()
    assert not re.search(r"all-gather", hlo), "kernel was gathered, not split"
    out = fn(q, k, v, pad)
    ref = _xla_reference(q, k, v, pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_save_stats_tp_sharded_no_allgather():
    """Under head-sharded TP, the lse residual must partition with the heads
    (compound (e f) sharding-rule factor) — an output-only factor would be
    replicated by Shardy, inserting an all-gather between fwd and bwd."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = len(jax.devices())
    if n < 4:
        pytest.skip("needs >=4 devices")
    devs = np.array(jax.devices()[: (n // 4) * 4]).reshape(-1, 4)
    mesh = Mesh(devs, ("dp", "tp"))
    B, T, H, d = 4, 24, 4, 8
    rng = np.random.default_rng(5)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
        for _ in range(3)
    )
    pad = jnp.ones((B, T), bool)
    qsh = NamedSharding(mesh, P("dp", None, "tp", None))
    psh = NamedSharding(mesh, P("dp", None))
    fn = jax.jit(
        lambda q, k, v, pad: jax.grad(
            lambda q: jnp.sum(short_t_attention(q, k, v, pad, save_stats=True))
        )(q),
        in_shardings=(qsh, qsh, qsh, psh),
    )
    hlo = fn.lower(q, k, v, pad).compile().as_text()
    assert not re.search(r"all-gather", hlo), "lse residual was gathered"
    g = fn(q, k, v, pad)
    g_ref = jax.grad(
        lambda q: jnp.sum(short_t_attention(q, k, v, pad))
    )(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_fully_masked_row_stays_finite():
    """A row whose pad_mask is all-False (eval dummy with input_length=1)
    must produce finite output, matching the XLA path's -1e30 bias."""
    B, T, H, d = 2, 16, 2, 8
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, T, H, d)), jnp.float32)
        for _ in range(3)
    )
    pad = jnp.asarray([[True] * T, [False] * T])
    out = short_t_attention(q, k, v, pad)
    assert np.all(np.isfinite(np.asarray(out)))
    g = jax.grad(
        lambda q: jnp.sum(short_t_attention(q, k, v, pad))
    )(q)
    assert np.all(np.isfinite(np.asarray(g)))
