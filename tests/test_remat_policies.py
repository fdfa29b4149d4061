"""Every remat policy computes the SAME training math.

Rematerialisation must never change values — only what is stored vs
recomputed. One tiny-model train-step value+grad per policy, pinned
against ``nothing_saveable``. This is the guard for the named-checkpoint
policies (the production default ``save_qk_ctx`` included): a policy
whose saved names drift from what the model emits would silently change
the replay structure, and one whose residuals are wrong would change
gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coral_tpu.models.wav2vec2 import (
    _REMAT_POLICIES,
    Wav2Vec2Config,
    Wav2Vec2ForCTC,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Wav2Vec2Config.tiny(
        vocab_size=12,
        # The production compute-path flags, so the policies interact with
        # the same kernels/checkpoint names they see at scale (interpret
        # mode on CPU).
        fused_ffn=True, fused_ffn_ln=True, fused_ffn_block=True,
        attention_save_stats="v2", attention_impl="pallas",
        hidden_dropout=0.0, activation_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, mask_feature_prob=0.0,
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((2, 3200)), jnp.float32)
    lengths = jnp.asarray([3200, 2400])

    def make_loss(policy):
        model = Wav2Vec2ForCTC(
            cfg, gradient_checkpointing=True, remat_policy=policy
        )

        def loss(params):
            logits, _ = model.apply(
                {"params": params}, audio, lengths, deterministic=True
            )
            return jnp.sum(logits.astype(jnp.float32) ** 2)

        return model, loss

    model, _ = make_loss("nothing_saveable")
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, audio, lengths
    )["params"]
    return params, make_loss


def test_all_policies_match_nothing_saveable(tiny_setup):
    params, make_loss = tiny_setup
    _, ref_loss = make_loss("nothing_saveable")
    ref_val, ref_grad = jax.value_and_grad(ref_loss)(params)
    assert np.isfinite(float(ref_val))

    for policy in _REMAT_POLICIES:
        if policy == "nothing_saveable":
            continue
        _, loss = make_loss(policy)
        val, grad = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(
            float(val), float(ref_val), rtol=1e-6,
            err_msg=f"loss mismatch under remat_policy={policy}",
        )
        for (p0, g0), (p1, g1) in zip(
            jax.tree_util.tree_leaves_with_path(ref_grad),
            jax.tree_util.tree_leaves_with_path(grad),
        ):
            assert p0 == p1
            # Replay restructuring changes f32 accumulation order, so exact
            # equality is not expected — a structural policy error (wrong
            # residual, stale name) would be O(1) relative, far outside this.
            # (Observed worst case on the CPU-AOT host: 4.1e-4 relative on a
            # single FE conv-kernel grad element under save_matmul_inputs.)
            np.testing.assert_allclose(
                np.asarray(g0), np.asarray(g1), rtol=1e-3, atol=5e-5,
                err_msg=f"{policy}: d{jax.tree_util.keystr(p0)}",
            )


def test_whisper_policies_match_nothing_saveable():
    """Same guard for the whisper layer scans (REMAT_POLICIES there)."""
    import dataclasses

    from coral_tpu.models.whisper import (
        REMAT_POLICIES,
        WhisperConfig,
        forward,
        init_whisper_params,
    )

    cfg = WhisperConfig.tiny_test(
        vocab_size=64, max_source_positions=100,
        fused_ffn=True, fused_ffn_ln=True, fused_ffn_block=True,
        activation_dropout=0.0, apply_spec_augment=False,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    mel = jnp.asarray(
        rng.standard_normal((2, 200, cfg.num_mel_bins)), jnp.float32
    )
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 9)), jnp.int32)

    def make_loss(policy):
        c = dataclasses.replace(cfg, remat_policy=policy)

        def loss(p):
            logits = forward(p, c, mel, ids, deterministic=True,
                             gradient_checkpointing=True)
            return jnp.sum(logits.astype(jnp.float32) ** 2)

        return loss

    ref_val, ref_grad = jax.value_and_grad(
        make_loss("nothing_saveable"))(params)
    assert np.isfinite(float(ref_val))
    for policy in REMAT_POLICIES:
        if policy == "nothing_saveable":
            continue
        val, grad = jax.value_and_grad(make_loss(policy))(params)
        np.testing.assert_allclose(
            float(val), float(ref_val), rtol=1e-6,
            err_msg=f"whisper loss mismatch under remat_policy={policy}",
        )
        for (p0, g0), (p1, g1) in zip(
            jax.tree_util.tree_leaves_with_path(ref_grad),
            jax.tree_util.tree_leaves_with_path(grad),
        ):
            assert p0 == p1
            np.testing.assert_allclose(
                np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-5,
                err_msg=f"whisper {policy}: d{jax.tree_util.keystr(p0)}",
            )
