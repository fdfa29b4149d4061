"""Parity tests: Pallas CTC kernels vs the lax.scan reference implementation.

The kernels run in interpreter mode on the CPU host; on TPU the same code
compiles through Mosaic. Forward alphas, backward betas, loss values, and
gradients must all match the scan implementation.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coral_tpu.ops.ctc import (
    _backward_betas,
    _backward_betas_pallas,
    _extended_labels,
    _forward_alphas,
    _forward_alphas_pallas,
    ctc_loss,
)

B, T, V, L = 4, 24, 12, 6
BLANK = V - 1


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((T, B, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = jnp.asarray(
        rng.integers(0, V - 1, size=(B, L)), dtype=jnp.int32
    )
    input_lengths = jnp.asarray([T, T - 4, T - 9, 15], dtype=jnp.int32)
    label_lengths = jnp.asarray([L, L - 2, 3, 1], dtype=jnp.int32)
    return log_probs, labels, input_lengths, label_lengths


def test_alpha_parity(problem):
    log_probs, labels, input_lengths, label_lengths = problem
    ext = _extended_labels(labels, BLANK)
    ref_alphas, ref_logp = _forward_alphas(
        log_probs, ext, input_lengths, label_lengths, BLANK
    )
    pal_alphas, pal_logp = _forward_alphas_pallas(
        log_probs, ext, input_lengths, label_lengths, BLANK, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(pal_logp), np.asarray(ref_logp), rtol=1e-5
    )
    # compare only reachable (finite) states; -inf floors may differ in padding
    ref = np.asarray(ref_alphas)
    pal = np.asarray(pal_alphas)
    finite = ref > -1e29
    np.testing.assert_allclose(pal[finite], ref[finite], rtol=1e-5)
    assert (pal[~finite] < -1e28).all()


def test_beta_parity(problem):
    log_probs, labels, input_lengths, label_lengths = problem
    ext = _extended_labels(labels, BLANK)
    ref = np.asarray(
        _backward_betas(log_probs, ext, input_lengths, label_lengths, BLANK)
    )
    pal = np.asarray(
        _backward_betas_pallas(
            log_probs, ext, input_lengths, label_lengths, BLANK, interpret=True
        )
    )
    finite = ref > -1e29
    np.testing.assert_allclose(pal[finite], ref[finite], rtol=1e-5)
    assert (pal[~finite] < -1e28).all()


def test_loss_and_grad_parity(problem):
    log_probs, labels, input_lengths, label_lengths = problem

    def loss_fn(lp):
        return ctc_loss(
            lp, labels, input_lengths, label_lengths, blank_id=BLANK,
            reduction="sum",
        )

    os.environ["CORAL_CTC_IMPL"] = "xla"
    try:
        ref_loss, ref_grad = jax.value_and_grad(loss_fn)(log_probs)
        os.environ["CORAL_CTC_IMPL"] = "pallas_interpret"
        pal_loss, pal_grad = jax.value_and_grad(loss_fn)(log_probs)
    finally:
        os.environ.pop("CORAL_CTC_IMPL", None)

    np.testing.assert_allclose(float(pal_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pal_grad), np.asarray(ref_grad), atol=1e-5
    )


def test_infeasible_sample_zeroed():
    """A label longer than the frame budget must hit the zero_infinity path."""
    rng = np.random.default_rng(1)
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((4, 2, V)).astype(np.float32)), axis=-1
    )
    labels = jnp.asarray(rng.integers(0, V - 1, size=(2, L)), dtype=jnp.int32)
    input_lengths = jnp.asarray([4, 4], dtype=jnp.int32)
    label_lengths = jnp.asarray([L, 1], dtype=jnp.int32)  # L=6 > 4 frames

    os.environ["CORAL_CTC_IMPL"] = "pallas_interpret"
    try:
        per_sample = ctc_loss(
            log_probs, labels, input_lengths, label_lengths, blank_id=BLANK,
            reduction="none",
        )
    finally:
        os.environ.pop("CORAL_CTC_IMPL", None)
    assert float(per_sample[0]) == 0.0  # infeasible -> zeroed
    assert float(per_sample[1]) > 0.0


def test_multi_chunk_parity():
    """T > CHUNK_T exercises the cross-chunk state carry in VMEM scratch."""
    rng = np.random.default_rng(3)
    T2, B2, L2 = 300, 3, 20
    log_probs = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((T2, B2, V)).astype(np.float32)), -1
    )
    labels = jnp.asarray(rng.integers(0, V - 1, size=(B2, L2)), jnp.int32)
    input_lengths = jnp.asarray([T2, 200, 131], jnp.int32)
    label_lengths = jnp.asarray([L2, 10, 5], jnp.int32)
    ext = _extended_labels(labels, BLANK)

    ref_alphas, ref_logp = _forward_alphas(
        log_probs, ext, input_lengths, label_lengths, BLANK
    )
    pal_alphas, pal_logp = _forward_alphas_pallas(
        log_probs, ext, input_lengths, label_lengths, BLANK, interpret=True
    )
    np.testing.assert_allclose(np.asarray(pal_logp), np.asarray(ref_logp),
                               rtol=1e-5)
    ref_b = np.asarray(
        _backward_betas(log_probs, ext, input_lengths, label_lengths, BLANK)
    )
    pal_b = np.asarray(
        _backward_betas_pallas(
            log_probs, ext, input_lengths, label_lengths, BLANK, interpret=True
        )
    )
    finite = ref_b > -1e29
    np.testing.assert_allclose(pal_b[finite], ref_b[finite], rtol=1e-5)


def test_long_label_rows_fit_scoped_vmem():
    """Labels padded to the full 512-token budget (S' = 1025 -> 1152 lanes)
    used to overflow the 16 MB scoped-VMEM limit at the fixed 128-step time
    chunk; the adaptive chunk must keep parity at long S."""
    from coral_tpu.ops.ctc_pallas import _chunk_t

    assert _chunk_t(1152) < 128  # the shrink actually engages

    rng = np.random.default_rng(1)
    Tl, Bl, Vl, Ll = 40, 2, 12, 512
    logits = rng.standard_normal((Tl, Bl, Vl)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = jnp.asarray(rng.integers(0, Vl - 1, size=(Bl, Ll)), jnp.int32)
    input_lengths = jnp.asarray([Tl, Tl - 3], jnp.int32)
    label_lengths = jnp.asarray([12, 7], jnp.int32)
    ext = _extended_labels(labels, BLANK)
    ref_alphas, ref_logp = _forward_alphas(
        log_probs, ext, input_lengths, label_lengths, BLANK
    )
    pal_alphas, pal_logp = _forward_alphas_pallas(
        log_probs, ext, input_lengths, label_lengths, BLANK, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(pal_logp), np.asarray(ref_logp), rtol=1e-5
    )
    ref = np.asarray(ref_alphas)
    pal = np.asarray(pal_alphas)
    finite = ref > -1e29
    np.testing.assert_allclose(pal[finite], ref[finite], rtol=1e-5)
