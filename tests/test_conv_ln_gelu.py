"""Tests for the fused feature-encoder conv+LN+GELU op
(ops/conv_ln_gelu_pallas.py).

Unlike the plain-ops fallbacks in test_ln_gelu.py, these run the actual
Pallas kernels in interpreter mode (CPU) against the XLA composition —
forward and the full custom backward (dx including the cross-slab k=3 halo
spill, the accumulated dW, and dbias/dgamma/dbeta) — so the kernel logic
itself is exercised by the CPU suite. Mosaic-lowered parity on real hardware
is re-proved by ``tools/verify_kernels.py``.

Reference semantics: one HF ``Wav2Vec2FeatureEncoder`` layer-norm conv block
(reference src/coral/wav2vec2.py:104-126 selects the model; the block is
conv1d(stride 2) -> LayerNorm -> exact GELU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coral_tpu.ops.conv_ln_gelu_pallas as cg


def _make(k, B, T_in, C, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (B, T_in, C), dtype)
    w = (jax.random.normal(ks[1], (k, C, C), jnp.float32) * 0.05).astype(dtype)
    b = jax.random.normal(ks[2], (C,), jnp.float32) * 0.1
    gamma = 1.0 + jax.random.normal(ks[3], (C,), jnp.float32) * 0.1
    beta = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
    return x, w, b, gamma, beta


@pytest.mark.parametrize(
    "k,B,T_in,C",
    [
        (3, 2, 1995, 512),  # multi-slab, ragged tail, halo spill across slabs
        (3, 1, 511, 256),   # single slab, clipped x block
        (2, 1, 1024, 256),  # k=2, T_in == 2*TB*nT exactly (fully covered)
        (2, 2, 997, 256),   # k=2 ragged
    ],
)
def test_kernel_matches_xla_fwd_and_grads(k, B, T_in, C):
    eps = 1e-5
    x, w, b, gamma, beta = _make(k, B, T_in, C, jnp.float32)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a).astype(jnp.float32)))

    kern = lambda x, w, b, g, bt: cg._conv_ln_gelu(  # noqa: E731
        x, w, b, g, bt, k, eps, True
    )
    ref = lambda x, w, b, g, bt: cg._xla_reference(  # noqa: E731
        x, w, b, g, bt, k, eps
    )

    np.testing.assert_allclose(
        np.asarray(kern(x, w, b, gamma, beta)),
        np.asarray(ref(x, w, b, gamma, beta)),
        atol=2e-5,
    )
    got = jax.grad(loss(kern), argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    want = jax.grad(loss(ref), argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    for name, a, e in zip(("dx", "dw", "db", "dgamma", "dbeta"), got, want):
        scale = float(np.abs(np.asarray(e)).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(e) / scale, atol=3e-6,
            err_msg=name,
        )


def test_zero_gamma_channel_keeps_gradients_finite():
    """Round-3 review fix: the backward re-derives the LN residual from the
    saved pre-affine xhat, never dividing by gamma — a zero LN scale channel
    (reachable under weight decay) must not NaN the fused path's gradients."""
    k, B, T_in, C = 3, 1, 515, 256
    x, w, b, gamma, beta = _make(k, B, T_in, C, jnp.float32)
    gamma = gamma.at[7].set(0.0)

    def loss(*a):
        return jnp.sum(cg._conv_ln_gelu(*a, k, 1e-5, True).astype(jnp.float32))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w, b, gamma, beta)
    ref = jax.grad(
        lambda *a: jnp.sum(cg._xla_reference(*a, k, 1e-5)), argnums=(0, 1, 2, 3, 4)
    )(x, w, b, gamma, beta)
    for name, a, e in zip(("dx", "dw", "db", "dgamma", "dbeta"), grads, ref):
        assert np.all(np.isfinite(np.asarray(a))), name
        scale = float(np.abs(np.asarray(e)).max()) + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(e) / scale, atol=3e-6,
            err_msg=name,
        )


def test_exact_fit_shapes_route_to_xla():
    # T_out a multiple of _TB with input rows past the slab grid would leave
    # dx tail rows unwritten on the kernel path; the wrapper must fall back.
    k, B, C = 3, 1, 256
    T_in = 2 * cg._TB * 2 + 1  # T_out = 2*_TB exactly, one straggler row
    x, w, b, gamma, beta = _make(k, B, T_in, C, jnp.float32)
    out = cg.conv_ln_gelu(x, w, b, gamma, beta, interpret=False)
    want = cg._xla_reference(x, w, b, gamma, beta, k, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_eps_is_honoured():
    k = 2
    x, w, b, gamma, beta = _make(k, 1, 700, 256, jnp.float32)
    big = cg._conv_ln_gelu(x, w, b, gamma, beta, k, 10.0, True)
    want = cg._xla_reference(x, w, b, gamma, beta, k, 10.0)
    np.testing.assert_allclose(np.asarray(big), np.asarray(want), atol=2e-5)
    assert not np.allclose(
        np.asarray(big),
        np.asarray(cg._xla_reference(x, w, b, gamma, beta, k, 1e-5)),
    )


def test_feature_encoder_uses_fused_conv():
    import coral_tpu.models.wav2vec2 as w2v

    assert "conv_ln_gelu" in open(w2v.__file__).read()


def test_bfloat16_close():
    k = 3
    x, w, b, gamma, beta = _make(k, 1, 999, 256, jnp.bfloat16)
    got = cg._conv_ln_gelu(x, w, b, gamma, beta, k, 1e-5, True)
    want = cg._xla_reference(x, w, b, gamma, beta, k, 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.06
    )
