"""Parity tests for the native CTC loss against torch.nn.functional.ctc_loss.

The reference's training loss is torch's CUDA CTC inside Wav2Vec2ForCTC
(reference: src/coral/wav2vec2.py:120,125); these tests pin value- and
gradient-parity of the JAX reimplementation on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from coral_tpu.ops import ctc_loss


def make_case(rng, B=3, T=40, V=10, L=12, blank=0, degenerate=False):
    """Random CTC problem with variable lengths."""
    logits = rng.standard_normal((T, B, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = rng.integers(low=T // 2, high=T + 1, size=B)
    if degenerate:
        # labels longer than the frames can ever emit -> infeasible alignment
        label_lengths = np.full(B, L)
        input_lengths = np.full(B, 4)
    else:
        label_lengths = rng.integers(low=1, high=L + 1, size=B)
    labels = rng.integers(low=1, high=V, size=(B, L))
    # force some repeats to exercise the skip-transition rule
    if L >= 4:
        labels[:, 2] = labels[:, 1]
    return np.asarray(log_probs), labels, input_lengths, label_lengths, blank


def torch_ctc(log_probs, labels, input_lengths, label_lengths, blank, reduction,
              zero_infinity=True, want_grad=False):
    lp = torch.tensor(log_probs, requires_grad=want_grad)
    loss = F.ctc_loss(
        lp,
        torch.tensor(labels),
        torch.tensor(input_lengths),
        torch.tensor(label_lengths),
        blank=blank,
        reduction=reduction,
        zero_infinity=zero_infinity,
    )
    if want_grad:
        (loss.sum() if loss.dim() else loss).backward()
        return loss.detach().numpy(), lp.grad.numpy()
    return loss.detach().numpy(), None


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_value_parity(reduction, seed):
    rng = np.random.default_rng(seed)
    log_probs, labels, in_len, lab_len, blank = make_case(rng)
    ours = ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(labels), jnp.asarray(in_len),
        jnp.asarray(lab_len), blank_id=blank, reduction=reduction,
    )
    theirs, _ = torch_ctc(log_probs, labels, in_len, lab_len, blank, reduction)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduction", ["sum", "mean"])
def test_gradient_parity_through_log_softmax(reduction):
    """End-to-end gradient wrt logits, through log_softmax, must match torch.

    Note: torch's CTC backward folds the softmax Jacobian into the gradient it
    reports for `log_probs` (it assumes a preceding log_softmax), so the
    gradients wrt raw `log_probs` are NOT comparable — but the training-relevant
    gradient wrt logits is, and that is what this test pins.
    """
    rng = np.random.default_rng(7)
    B, T, V, L = 3, 40, 10, 12
    logits = rng.standard_normal((T, B, V)).astype(np.float32)
    labels = rng.integers(1, V, size=(B, L))
    labels[:, 2] = labels[:, 1]
    in_len = np.array([40, 30, 25])
    lab_len = np.array([12, 5, 1])

    def loss_fn(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(
            lp, jnp.asarray(labels), jnp.asarray(in_len), jnp.asarray(lab_len),
            blank_id=0, reduction=reduction,
        )

    ours_grad = jax.grad(loss_fn)(jnp.asarray(logits))

    lg_t = torch.tensor(logits, requires_grad=True)
    lp_t = torch.log_softmax(lg_t, dim=-1)
    loss = F.ctc_loss(
        lp_t, torch.tensor(labels), torch.tensor(in_len), torch.tensor(lab_len),
        blank=0, reduction=reduction, zero_infinity=True,
    )
    loss.backward()
    np.testing.assert_allclose(
        np.asarray(ours_grad), lg_t.grad.numpy(), rtol=1e-3, atol=1e-5
    )


def test_custom_vjp_matches_autodiff():
    """The hand-written backward must equal autodiff through the alpha scan."""
    from coral_tpu.ops.ctc import _extended_labels, _forward_alphas

    rng = np.random.default_rng(13)
    log_probs, labels, in_len, lab_len, blank = make_case(rng)

    def nll_autodiff(lp):
        ext = _extended_labels(jnp.asarray(labels), blank)
        _, logp = _forward_alphas(
            lp, ext, jnp.asarray(in_len), jnp.asarray(lab_len), blank
        )
        return jnp.sum(-logp)

    def nll_custom(lp):
        return ctc_loss(
            lp, jnp.asarray(labels), jnp.asarray(in_len), jnp.asarray(lab_len),
            blank_id=blank, reduction="sum",
        )

    g_auto = jax.grad(nll_autodiff)(jnp.asarray(log_probs))
    g_custom = jax.grad(nll_custom)(jnp.asarray(log_probs))
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=1e-4, atol=1e-6
    )


def test_nonzero_blank_id():
    """wav2vec2 uses the pad token (last vocab id) as blank."""
    rng = np.random.default_rng(3)
    V = 10
    log_probs, labels, in_len, lab_len, _ = make_case(rng, V=V, blank=V - 1)
    labels = np.clip(labels, 1, V - 2)
    ours = ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(labels), jnp.asarray(in_len),
        jnp.asarray(lab_len), blank_id=V - 1, reduction="sum",
    )
    theirs, _ = torch_ctc(log_probs, labels, in_len, lab_len, V - 1, "sum")
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def test_zero_infinity_zeroes_loss_and_grad():
    """Labels longer than frames -> infeasible -> loss 0 and grad 0 per torch."""
    rng = np.random.default_rng(11)
    log_probs, labels, in_len, lab_len, blank = make_case(rng, degenerate=True)

    def loss_fn(lp):
        return ctc_loss(
            lp, jnp.asarray(labels), jnp.asarray(in_len), jnp.asarray(lab_len),
            blank_id=blank, reduction="sum", zero_infinity=True,
        )

    value, grad = jax.value_and_grad(loss_fn)(jnp.asarray(log_probs))
    theirs, theirs_grad = torch_ctc(
        log_probs, labels, in_len, lab_len, blank, "sum", zero_infinity=True,
        want_grad=True,
    )
    np.testing.assert_allclose(np.asarray(value), theirs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), theirs_grad, atol=1e-6)
    assert np.isfinite(np.asarray(value))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_minus_hundred_label_padding():
    """-100-padded labels (HF collator convention) must be handled."""
    rng = np.random.default_rng(5)
    log_probs, labels, in_len, lab_len, blank = make_case(rng)
    padded = labels.copy()
    for b in range(len(lab_len)):
        padded[b, lab_len[b]:] = -100
    ours = ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(padded), jnp.asarray(in_len),
        jnp.asarray(lab_len), blank_id=blank, reduction="sum",
    )
    ref = ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(labels), jnp.asarray(in_len),
        jnp.asarray(lab_len), blank_id=blank, reduction="sum",
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-6)


def test_jit_and_vmap_compatible():
    rng = np.random.default_rng(9)
    log_probs, labels, in_len, lab_len, blank = make_case(rng)
    jitted = jax.jit(
        lambda lp: ctc_loss(
            lp, jnp.asarray(labels), jnp.asarray(in_len), jnp.asarray(lab_len),
            blank_id=blank, reduction="sum",
        )
    )
    eager = ctc_loss(
        jnp.asarray(log_probs), jnp.asarray(labels), jnp.asarray(in_len),
        jnp.asarray(lab_len), blank_id=blank, reduction="sum",
    )
    np.testing.assert_allclose(
        np.asarray(jitted(jnp.asarray(log_probs))), np.asarray(eager), rtol=1e-5
    )
