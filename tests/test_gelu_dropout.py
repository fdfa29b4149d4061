"""Tests for the fused GELU+dropout op (ops/gelu_dropout_pallas.py).

Off-TPU the op composes plain JAX gelu+dropout; the TPU kernel's erf
approximation and mask determinism are exercised on hardware by the train
step itself. These tests pin the user-facing semantics both paths share.
"""

import jax
import jax.numpy as jnp
import numpy as np

from coral_tpu.ops.gelu_dropout_pallas import gelu_dropout


def test_polynomial_gelu_pieces_wide_range():
    """The kernels' minimax polynomials for Phi and gelu' (FMA-only, no
    exp/divide) vs the exact functions over [-9, 9] — covering both fit
    intervals AND the clamp/saturation tails."""
    import math

    from coral_tpu.ops.gelu_dropout_pallas import _dgelu, _phi

    xs = np.linspace(-9, 9, 200001, dtype=np.float64)
    phi_ref = 0.5 * (1.0 + np.asarray([math.erf(v / math.sqrt(2)) for v in xs]))
    phi_got = np.asarray(_phi(jnp.asarray(xs, jnp.float32)), np.float64)
    # gelu = x * Phi is what the forward kernels emit.
    assert np.max(np.abs(xs * phi_got - xs * phi_ref)) < 2e-6
    dgelu_ref = phi_ref + xs * np.exp(-0.5 * xs * xs) / math.sqrt(2 * math.pi)
    dgelu_got = np.asarray(_dgelu(jnp.asarray(xs, jnp.float32)), np.float64)
    assert np.max(np.abs(dgelu_got - dgelu_ref)) < 1e-6


def test_rate_zero_is_exact_gelu():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 40, 64)), jnp.float32
    )
    out = gelu_dropout(x, 0.0, jax.random.PRNGKey(0))
    ref = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dropout_statistics_and_scaling():
    x = jnp.ones((4, 100, 128), jnp.float32)
    out = gelu_dropout(x, 0.25, jax.random.PRNGKey(1))
    kept = np.asarray(out) != 0
    assert abs(kept.mean() - 0.75) < 0.02
    g1 = float(jax.nn.gelu(jnp.asarray(1.0), approximate=False))
    np.testing.assert_allclose(
        np.asarray(out)[kept], g1 / 0.75, rtol=1e-5
    )


def test_gradient_masks_match_forward():
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 50, 64)), jnp.float32
    )
    key = jax.random.PRNGKey(3)
    y = gelu_dropout(x, 0.2, key)
    g = jax.grad(lambda x: jnp.sum(gelu_dropout(x, 0.2, key)))(x)
    # zero output -> zero grad and vice versa (identical mask stream);
    # gelu' can be ~0 where gelu is nonzero only deep in the negative tail.
    dropped = np.asarray(y) == 0
    near_flat = np.abs(np.asarray(x)) > 4
    assert np.all((np.asarray(g) == 0) | ~dropped | near_flat)


def test_train_step_uses_fused_path():
    """The wav2vec2 FFN routes activation dropout through the fused op."""
    import coral_tpu.models.wav2vec2 as w2v

    src = open(w2v.__file__).read()
    assert "gelu_dropout" in src
