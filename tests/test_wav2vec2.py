"""Forward-parity tests for the flax wav2vec2 against HF torch.

A tiny randomly-initialised HF Wav2Vec2ForCTC is converted with
``wav2vec2_params_from_torch`` and both models are run on the same batch; logits
must match to float32 tolerance. This pins the full architecture: conv feature
encoder, feature projection, positional conv (weight-norm fold), stable-LN
transformer stack, padding masks, and the CTC head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from coral_tpu.models import Wav2Vec2Config, Wav2Vec2ForCTC
from coral_tpu.models.convert import wav2vec2_params_from_torch

HF_KW = dict(
    vocab_size=46,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    conv_dim=(16, 16, 16, 16),
    conv_stride=(5, 4, 4, 4),
    conv_kernel=(10, 3, 3, 3),
    conv_bias=True,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=2,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC as HFModel

    torch.manual_seed(0)
    cfg = HFConfig(do_stable_layer_norm=True, feat_extract_norm="layer", **HF_KW)
    return HFModel(cfg).eval()


@pytest.fixture(scope="module")
def our_setup(hf_model):
    config = Wav2Vec2Config.tiny()
    params = wav2vec2_params_from_torch(hf_model.state_dict(), config)
    model = Wav2Vec2ForCTC(config)
    return model, {"params": params}, config


def test_forward_parity_full_batch(hf_model, our_setup):
    model, variables, config = our_setup
    rng = np.random.default_rng(0)
    B, T = 2, 1600
    audio = rng.standard_normal((B, T)).astype(np.float32)
    lengths = np.array([T, T])

    with torch.no_grad():
        theirs = hf_model(torch.tensor(audio)).logits.numpy()

    ours, frame_lengths = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(lengths), deterministic=True
    )
    assert ours.shape == theirs.shape
    # atol derives from the production GELU tables: the short minimax fits
    # (CORAL_GELU_POLY=short, adopted in the round-5 hardware A/B — see
    # ops/gelu_dropout_pallas.py) carry a documented final-function error of
    # <=1.85e-4 per GELU vs torch's exact erf oracle, which surfaces here as
    # up to ~1.6e-4 in the logits. 5e-4 covers that while staying ~100x below
    # any structural-parity error; with CORAL_GELU_POLY=f32 the observed max
    # deviation is <1e-5.
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=5e-4)


def test_forward_parity_with_padding(hf_model, our_setup):
    """Padded samples must produce identical logits at valid frames."""
    model, variables, config = our_setup
    rng = np.random.default_rng(1)
    B, T = 2, 2000
    lengths = np.array([2000, 1200])
    audio = rng.standard_normal((B, T)).astype(np.float32)
    audio[1, 1200:] = 0.0
    attention_mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int64)

    with torch.no_grad():
        theirs = hf_model(
            torch.tensor(audio), attention_mask=torch.tensor(attention_mask)
        ).logits.numpy()

    ours, frame_lengths = model.apply(
        variables, jnp.asarray(audio), jnp.asarray(lengths), deterministic=True
    )
    valid = np.asarray(frame_lengths)
    hf_valid = hf_model._get_feat_extract_output_lengths(
        torch.tensor(lengths)
    ).numpy()
    np.testing.assert_array_equal(valid, hf_valid)
    for b in range(B):
        # Same short-GELU-table bound as test_forward_parity_full_batch.
        np.testing.assert_allclose(
            np.asarray(ours)[b, : valid[b]], theirs[b, : valid[b]],
            rtol=1e-4, atol=5e-4,
        )


def test_frame_lengths_formula(our_setup):
    _, _, config = our_setup
    lengths = jnp.asarray([16000, 8000, 1600])
    out = config.feat_extract_output_lengths(lengths)
    expected = []
    for L in [16000, 8000, 1600]:
        for k, s in zip(config.conv_kernel, config.conv_stride):
            L = (L - k) // s + 1
        expected.append(L)
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_spec_augment_changes_output(our_setup):
    model, variables, config = our_setup
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32))
    lengths = jnp.asarray([1600, 1600])

    out_det, _ = model.apply(variables, audio, lengths, deterministic=True)
    out_train, _ = model.apply(
        variables, audio, lengths, deterministic=False,
        rngs={
            "dropout": jax.random.PRNGKey(0),
            "spec_augment": jax.random.PRNGKey(1),
        },
    )
    assert not np.allclose(np.asarray(out_det), np.asarray(out_train))


def test_freeze_feature_encoder_stops_gradient(our_setup):
    model, variables, config = our_setup
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((1, 1600)).astype(np.float32))
    lengths = jnp.asarray([1600])

    def loss_fn(params, freeze):
        out, _ = model.apply(
            {"params": params}, audio, lengths, deterministic=True,
            freeze_feature_encoder=freeze,
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss_fn)(variables["params"], True)
    conv_grad = grads["wav2vec2"]["feature_extractor"]["conv_layers_0"]["conv_kernel"]
    assert float(jnp.abs(conv_grad).max()) == 0.0

    grads_unfrozen = jax.grad(loss_fn)(variables["params"], False)
    conv_grad = grads_unfrozen["wav2vec2"]["feature_extractor"]["conv_layers_0"][
        "conv_kernel"
    ]
    assert float(jnp.abs(conv_grad).max()) > 0.0


@pytest.mark.parametrize("shape", [(2, 37, 32, 2, 16), (1, 40, 48, 3, 8),
                                   (2, 33, 64, 4, 128)])
def test_pos_conv_fold_parity(shape):
    """The factor-2 space-to-depth posconv is exactly the grouped conv.

    Covers odd/even T, odd group counts, and the production k=128; value and
    all three gradients must match the XLA grouped-conv path to float32
    rounding (reference: HF's padded-grouped-conv positional embedding,
    /root/reference's wav2vec2 stack uses it via transformers).
    """
    from coral_tpu.models.wav2vec2 import _conv1d, _pos_conv_folded

    B, T, C, g, K = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, C // g, C)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    ref = _conv1d(x, w, b, stride=1, padding=[(K // 2, K // 2)], groups=g)
    ref = ref[:, :-1]
    got = _pos_conv_folded(x, w, b, g, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    def loss(fn):
        return lambda x, w, b: jnp.sum(jnp.sin(fn(x, w, b)))

    f_ref = loss(lambda x, w, b: _conv1d(
        x, w, b, stride=1, padding=[(K // 2, K // 2)], groups=g)[:, :-1])
    f_new = loss(lambda x, w, b: _pos_conv_folded(x, w, b, g, jnp.float32))
    for a, e in zip(jax.grad(f_new, argnums=(0, 1, 2))(x, w, b),
                    jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-4, rtol=1e-4)


def test_pos_conv_fold_model_forward(hf_model, our_setup):
    """pos_conv_fold=True leaves the full-model forward unchanged."""
    model, variables, config = our_setup
    import dataclasses

    cfg2 = dataclasses.replace(config, pos_conv_fold=True)
    model2 = Wav2Vec2ForCTC(cfg2)
    rng = np.random.default_rng(5)
    audio = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
    lengths = jnp.asarray([3200, 2400])
    out1, _ = model.apply(variables, audio, lengths, deterministic=True)
    out2, _ = model2.apply(variables, audio, lengths, deterministic=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               atol=1e-5, rtol=1e-5)
