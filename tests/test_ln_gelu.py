"""Tests for the fused LayerNorm+GELU op (ops/ln_gelu_pallas.py).

Off-TPU the op composes plain ops; the TPU kernel's forward/backward
(including ragged last tiles and the dgamma/dbeta row masking) was validated
against XLA autodiff on hardware to ~1e-6. These tests pin the shared
semantics and the gradient path of the fallback. The oracles evaluate GELU
through ``gelu_poly`` (the selected polynomial tables — the kernel's and the
fallback's numerics), so they test the LN/GELU *mechanics* at tight tolerance
under either CORAL_GELU_POLY table set; the poly-vs-exact error bound itself
is pinned in tests/test_gelu_dropout.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from coral_tpu.ops.gelu_dropout_pallas import gelu_poly
from coral_tpu.ops.ln_gelu_pallas import _EPS, ln_gelu


def _ref(x, gamma, beta):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mu
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    n = c * jax.lax.rsqrt(var + _EPS)
    return gelu_poly(n * gamma + beta)


def test_matches_layernorm_gelu():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 70, 64)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(64) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ln_gelu(x, gamma, beta)),
        np.asarray(_ref(x, gamma, beta)),
        atol=1e-5,
    )


def test_gradients_match_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 40, 32)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(32) * 0.1 + 1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)

    def loss(f):
        return lambda x, g, b: jnp.sum(jnp.sin(f(x, g, b)))

    got = jax.grad(loss(ln_gelu), argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(loss(_ref), argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eps_is_honoured():
    # A deliberately huge eps changes the output; the kernel must thread the
    # caller's layer_norm_eps instead of a hardcoded 1e-5 (ADVICE round 2).
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 32)), jnp.float32)
    gamma = jnp.ones(32, jnp.float32)
    beta = jnp.zeros(32, jnp.float32)
    big = np.asarray(ln_gelu(x, gamma, beta, eps=10.0))
    mu = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mu
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    want = gelu_poly(c * jax.lax.rsqrt(var + 10.0))
    np.testing.assert_allclose(big, np.asarray(want), atol=1e-6)
    assert not np.allclose(big, np.asarray(ln_gelu(x, gamma, beta)))


def test_feature_encoder_uses_fused_op():
    import coral_tpu.models.wav2vec2 as w2v

    assert "ln_gelu" in open(w2v.__file__).read()
