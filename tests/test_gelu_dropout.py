"""Tests for the fused GELU+dropout op (ops/gelu_dropout_pallas.py).

Off-TPU the op composes plain JAX gelu+dropout; the TPU kernel's erf
approximation and mask determinism are exercised on hardware by the train
step itself. These tests pin the user-facing semantics both paths share.
"""

import jax
import jax.numpy as jnp
import numpy as np

from coral_tpu.ops import gelu_dropout_pallas as gp
from coral_tpu.ops.gelu_dropout_pallas import gelu_dropout


def test_polynomial_gelu_pieces_wide_range():
    """The kernels' minimax polynomials for Phi and gelu' (FMA-only, no
    exp/divide) vs the exact functions over [-9, 9] — covering both fit
    intervals AND the clamp/saturation tails. Each table is pinned at its
    own design bound: the f32 tables at ~1e-6, the short (bf16-consumer)
    tables at their fitted maxima (tools/fit_gelu_poly.py) plus the bf16
    invisibility criterion — error under 1/3 of the bf16 quantisation
    floor max(ulp(0.5)/2, |f| 2^-9), so a bf16 cast of the output is at
    most 1 ulp from the exact function's cast."""
    import math

    from coral_tpu.ops import gelu_dropout_pallas as gp

    xs = np.linspace(-9, 9, 200001, dtype=np.float64)
    phi_ref = 0.5 * (1.0 + np.asarray([math.erf(v / math.sqrt(2)) for v in xs]))
    gelu_ref = xs * phi_ref
    dgelu_ref = phi_ref + xs * np.exp(-0.5 * xs * xs) / math.sqrt(2 * math.pi)

    def _eval(coef, bound, fn=None):
        x32 = jnp.asarray(xs, jnp.float32)
        got = np.asarray(gp._odd_poly(x32, coef, bound), np.float64)
        return got

    # f32 tables (CORAL_GELU_POLY=f32): near-f32-exact.
    phi_f32 = _eval(gp._PHI_COEF_F32, gp._PHI_B_F32)
    assert np.max(np.abs(xs * phi_f32 - gelu_ref)) < 2e-6
    dg_f32 = _eval(gp._DGELU_COEF_F32, gp._DGELU_B_F32)
    assert np.max(np.abs(dg_f32 - dgelu_ref)) < 1e-6

    # short tables (default): fitted maxima + bf16 invisibility.
    phi_s = _eval(gp._PHI_COEF_SHORT, gp._PHI_B_SHORT)
    gelu_err = np.abs(xs * phi_s - gelu_ref)
    assert np.max(gelu_err) < 2.5e-4
    bf16_floor = np.maximum(2.0 ** -10, np.abs(gelu_ref) * 2.0 ** -9)
    assert np.max(gelu_err / bf16_floor) < 1.0 / 3.0
    dg_s = _eval(gp._DGELU_COEF_SHORT, gp._DGELU_B_SHORT)
    dg_err = np.abs(dg_s - dgelu_ref)
    assert np.max(dg_err) < 3.5e-4
    bf16_floor = np.maximum(2.0 ** -10, np.abs(dgelu_ref) * 2.0 ** -9)
    assert np.max(dg_err / bf16_floor) < 1.0 / 3.0


def test_rate_zero_matches_exact_gelu_within_poly_bound():
    # The op's numerics are the selected polynomial tables (round-5
    # adjudication: short is the default, documented max |err| 1.85e-4 vs
    # exact GELU — under 0.3 of the bf16 floor on the cast output paths).
    # The fallback now evaluates the same tables, so this bound holds on
    # every backend.
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 40, 64)), jnp.float32
    )
    out = gelu_dropout(x, 0.0, jax.random.PRNGKey(0))
    ref = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
    # And it is exactly the gelu_poly numerics, not merely close to exact.
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(gp.gelu_poly(x)), atol=1e-6
    )


def test_dropout_statistics_and_scaling():
    x = jnp.ones((4, 100, 128), jnp.float32)
    out = gelu_dropout(x, 0.25, jax.random.PRNGKey(1))
    kept = np.asarray(out) != 0
    assert abs(kept.mean() - 0.75) < 0.02
    # Dropout-scaling mechanics: kept values are gelu(1)/keep with the op's
    # own (gelu_poly) numerics.
    g1 = float(gp.gelu_poly(jnp.asarray(1.0, jnp.float32)))
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
