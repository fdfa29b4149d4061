"""Whisper encoder-decoder, TPU-native functional JAX implementation.

The reference fine-tunes HF ``WhisperForConditionalGeneration`` checkpoints
(reference: ``src/coral/whisper.py:67-126``, ``config/model/whisper-*.yaml``).
This is a ground-up implementation of the same architecture designed for XLA:

- parameters live in an explicit pytree with per-layer tensors stacked along a
  leading (L, ...) axis; every layer stack runs as ONE compiled layer body under
  ``jax.lax.scan`` (optionally ``jax.checkpoint``-rematerialised);
- attention uses ``jax.nn.dot_product_attention`` so XLA picks a fused kernel;
- greedy/beam generation runs entirely under jit as a ``lax.scan`` over positions
  with a functional KV-cache (no Python autoregressive loop, no host round-trips);
- the log-mel frontend (``coral_tpu.audio.mel``) fuses into the encoder's first
  matmuls on device.

The pure-function style (rather than flax linen) is deliberate: the decode step
and the training step share one parameter tree with no module-name plumbing, which
keeps the KV-cache scan simple and fully donatable. Weight layout mirrors the HF
module tree so ``coral_tpu.models.convert.whisper_params_from_torch`` maps
published checkpoints 1:1.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..ops.decode_attention import (
    decode_cross_attention,
    decode_self_attention,
)

# Remat policies for the layer scans. "save_matmul_inputs" stores exactly the
# inputs of the big matmuls per layer (LN outputs, q/k/v, attention context,
# FFN pre-activation input) so backward recomputes only the attention kernel
# and elementwise chains — the same trade as the wav2vec2 encoder
# (models/wav2vec2.py _REMAT_POLICIES).
REMAT_POLICIES = {
    "nothing_saveable": jax.checkpoint_policies.nothing_saveable,
    # flash_o/l/m are the encoder flash kernel's VJP residuals (named on
    # the residual vars inside ops/flash_attention.py): saving them DCEs
    # both the remat replay of the flash forward AND the backward's own
    # forward recompute (~1.9 ms/layer at whisper-small; ~38 MB/layer for
    # o + two f32 row-stat vectors).
    "save_matmul_inputs": jax.checkpoint_policies.save_only_these_names(
        "attn_in", "q", "k", "v", "attn_ctx", "cross_in", "cross_q",
        "cross_attn_ctx", "ffn_in", "flash_o", "flash_l", "flash_m",
    ),
    # Memory-lean middle ground for the large models: keep only the flash
    # kernel's VJP residuals (so neither the remat replay nor the backward
    # re-runs the T=1500 flash forward) plus the attention outputs the
    # out-projection dWs read; the cheap LN/projection matmuls replay.
    # ~2 saved (B, T, D) tensors per layer instead of save_matmul_inputs'
    # 7+, moving the whisper-large-v3-turbo HBM batch frontier.
    "save_flash_ctx": jax.checkpoint_policies.save_only_these_names(
        "attn_ctx", "cross_attn_ctx", "flash_o", "flash_l", "flash_m",
    ),
}


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Architecture hyperparameters (defaults = whisper-tiny)."""

    vocab_size: int = 51_865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    ffn_dim: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # Dropouts (reference config surface: config/model/whisper-*.yaml)
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.1
    # SpecAugment on the mel features (reference: src/coral/whisper.py:78-82)
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.5
    mask_time_length: int = 10
    mask_feature_prob: float = 0.5
    mask_feature_length: int = 64
    dtype: Any = jnp.float32
    # Encoder self-attention backend: "flash" (blocked Pallas kernel; wins at
    # the encoder's T=1500) or "xla". Decoder/cross attention always use XLA.
    encoder_attention_impl: str = "flash"
    # Train-path LayerNorms: "xla" or "pallas" (ops/ln_gelu_pallas.ln_fused).
    # The decode path keeps plain XLA LN (per-token shapes don't tile).
    ln_impl: str = "xla"
    # Fuse fc1 with its GELU(+dropout) epilogue on the train path so the
    # 4x-wide pre-activation never leaves VMEM (ops/ffn_pallas.py).
    fused_ffn: bool = False
    # Additionally fold the pre-FFN LayerNorm into the same kernel.
    fused_ffn_ln: bool = False
    # Run the whole FFN (LN + fc1 + GELU + dropout + fc2) as one custom_vjp
    # block whose backward needs no forward replay (ffn_ln_block).
    fused_ffn_block: bool = False
    # With fused_ffn_block: accumulate dW1/dW2 on-MXU inside the backward
    # kernel (VMEM-resident fp32 blocks).
    fused_ffn_block_dw: bool = False
    # With fused_ffn_block: fold fc2 into the forward kernel too.
    fused_ffn_block_fc2: bool = False
    # With fused_ffn_block: compute dg = dy @ W2^T inside the backward
    # kernel.
    fused_ffn_block_dg: bool = False
    # Layer-scan remat policy under gradient checkpointing (REMAT_POLICIES).
    remat_policy: str = "save_matmul_inputs"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads

    # Checkpoint families (HF config.json values for openai/whisper-*)
    @classmethod
    def tiny(cls, **kw) -> "WhisperConfig":
        return cls(**kw)

    @classmethod
    def base(cls, **kw) -> "WhisperConfig":
        return cls(
            d_model=512, encoder_layers=6, decoder_layers=6,
            encoder_attention_heads=8, decoder_attention_heads=8,
            ffn_dim=2048, **kw,
        )

    @classmethod
    def small(cls, **kw) -> "WhisperConfig":
        return cls(
            d_model=768, encoder_layers=12, decoder_layers=12,
            encoder_attention_heads=12, decoder_attention_heads=12,
            ffn_dim=3072, **kw,
        )

    @classmethod
    def medium(cls, **kw) -> "WhisperConfig":
        return cls(
            d_model=1024, encoder_layers=24, decoder_layers=24,
            encoder_attention_heads=16, decoder_attention_heads=16,
            ffn_dim=4096, **kw,
        )

    @classmethod
    def large_v2(cls, **kw) -> "WhisperConfig":
        return cls(
            d_model=1280, encoder_layers=32, decoder_layers=32,
            encoder_attention_heads=20, decoder_attention_heads=20,
            ffn_dim=5120, **kw,
        )

    @classmethod
    def large_v3(cls, **kw) -> "WhisperConfig":
        return cls(
            vocab_size=51_866, num_mel_bins=128,
            d_model=1280, encoder_layers=32, decoder_layers=32,
            encoder_attention_heads=20, decoder_attention_heads=20,
            ffn_dim=5120, **kw,
        )

    @classmethod
    def large_v3_turbo(cls, **kw) -> "WhisperConfig":
        return cls(
            vocab_size=51_866, num_mel_bins=128,
            d_model=1280, encoder_layers=32, decoder_layers=4,
            encoder_attention_heads=20, decoder_attention_heads=20,
            ffn_dim=5120, **kw,
        )

    @classmethod
    def tiny_test(cls, vocab_size: int = 300, **kw) -> "WhisperConfig":
        """A tiny config for tests."""
        return cls(
            vocab_size=vocab_size, d_model=32, encoder_layers=2, decoder_layers=2,
            encoder_attention_heads=2, decoder_attention_heads=2, ffn_dim=64,
            max_target_positions=64, **kw,
        )


# --------------------------------------------------------------------------------
# Parameter initialisation
# --------------------------------------------------------------------------------


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Whisper's sinusoid table: [sin | cos] concatenated along features."""
    log_timescale = np.log(10_000.0) / (dim // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


def _dense_init(rng, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    k = jax.nn.initializers.lecun_normal()(rng, (in_dim, out_dim), jnp.float32)
    p = {"kernel": k}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def _ln_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _attn_init(rng, d: int) -> dict:
    ks = jax.random.split(rng, 4)
    return {
        "q_proj": _dense_init(ks[0], d, d),
        "k_proj": _dense_init(ks[1], d, d, bias=False),
        "v_proj": _dense_init(ks[2], d, d),
        "out_proj": _dense_init(ks[3], d, d),
    }


def _stack_layers(rng, n_layers: int, make_layer) -> dict:
    layers = [make_layer(k) for k in jax.random.split(rng, n_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def init_whisper_params(rng: jax.Array, config: WhisperConfig) -> dict:
    """Random-init parameter tree (HF-like layout, stacked layers)."""
    d, ffn = config.d_model, config.ffn_dim
    r = jax.random.split(rng, 8)

    def enc_layer(k):
        ks = jax.random.split(k, 3)
        return {
            "self_attn": _attn_init(ks[0], d),
            "self_attn_layer_norm": _ln_init(d),
            "fc1": _dense_init(ks[1], d, ffn),
            "fc2": _dense_init(ks[2], ffn, d),
            "final_layer_norm": _ln_init(d),
        }

    def dec_layer(k):
        ks = jax.random.split(k, 4)
        return {
            "self_attn": _attn_init(ks[0], d),
            "self_attn_layer_norm": _ln_init(d),
            "encoder_attn": _attn_init(ks[1], d),
            "encoder_attn_layer_norm": _ln_init(d),
            "fc1": _dense_init(ks[2], d, ffn),
            "fc2": _dense_init(ks[3], ffn, d),
            "final_layer_norm": _ln_init(d),
        }

    conv1 = jax.nn.initializers.lecun_normal()(
        r[0], (3, config.num_mel_bins, d), jnp.float32
    )
    conv2 = jax.nn.initializers.lecun_normal()(r[1], (3, d, d), jnp.float32)
    return {
        "encoder": {
            "conv1": {"kernel": conv1, "bias": jnp.zeros((d,), jnp.float32)},
            "conv2": {"kernel": conv2, "bias": jnp.zeros((d,), jnp.float32)},
            "embed_positions": jnp.asarray(
                sinusoidal_positions(config.max_source_positions, d)
            ),
            "layers": _stack_layers(r[2], config.encoder_layers, enc_layer),
            "layer_norm": _ln_init(d),
        },
        "decoder": {
            "embed_tokens": jax.random.normal(
                r[3], (config.vocab_size, d), jnp.float32
            ) * 0.02,
            "embed_positions": jax.random.normal(
                r[4], (config.max_target_positions, d), jnp.float32
            ) * 0.02,
            "layers": _stack_layers(r[5], config.decoder_layers, dec_layer),
            "layer_norm": _ln_init(d),
        },
    }


# --------------------------------------------------------------------------------
# Primitive ops
# --------------------------------------------------------------------------------


def _dense(p: dict, x: jnp.ndarray, dtype) -> jnp.ndarray:
    out = x.astype(dtype) @ p["kernel"].astype(dtype)
    if "bias" in p:
        out = out + p["bias"].astype(dtype)
    return out


def _layer_norm(p: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # LN in float32 for numerical stability under bfloat16 compute.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _train_layer_norm(p: dict, x: jnp.ndarray, config) -> jnp.ndarray:
    """Train-path LN: optionally the one-pass Pallas kernel (ln_impl)."""
    if getattr(config, "ln_impl", "xla") == "pallas" and x.shape[-1] % 128 == 0:
        from ..ops.ln_gelu_pallas import ln_fused

        return ln_fused(x, p["scale"], p["bias"]).astype(x.dtype)
    return _layer_norm(p, x)


def _dropout(rng, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    B, T, D = x.shape
    return x.reshape(B, T, n_heads, D // n_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    B, T, H, Dh = x.shape
    return x.reshape(B, T, H * Dh)


def _ffn_activation(h: jnp.ndarray, act_drop: float, lrng) -> jnp.ndarray:
    """FFN activation with HF-parity activation dropout.

    The reference fine-tunes with ``activation_dropout`` (HF WhisperEncoder/
    DecoderLayer apply it after the fc1 activation; surface:
    ``config/model/whisper-*.yaml``). Routed through the fused Pallas
    GELU+dropout kernel on TPU.
    """
    if act_drop > 0.0:
        from ..ops.gelu_dropout_pallas import gelu_dropout

        return gelu_dropout(h, act_drop, lrng).astype(h.dtype)
    return jax.nn.gelu(h, approximate=False)


def _ffn_up(p: dict, x: jnp.ndarray, dtype, act_drop: float, lrng,
            config) -> jnp.ndarray:
    """fc1 + GELU (+ activation dropout), optionally as one fused kernel."""
    if getattr(config, "fused_ffn", False):
        from ..ops.ffn_pallas import ffn_fc1

        return ffn_fc1(
            x.astype(dtype), p["kernel"], p["bias"], act_drop,
            lrng if act_drop > 0.0 else None,
        )
    return _ffn_activation(_dense(p, x, dtype), act_drop, lrng)


def _ffn_block(lp: dict, x: jnp.ndarray, dtype, act_drop: float, lrng,
               config) -> jnp.ndarray:
    """Pre-FFN LayerNorm + fc1 + GELU (+ dropout); with ``fused_ffn_ln`` the
    whole chain runs in one kernel and "ffn_in" names the pre-LN stream."""
    if getattr(config, "fused_ffn_ln", False) and getattr(
        config, "fused_ffn", False
    ):
        from ..ops.ffn_pallas import ffn_ln_fc1

        lnp = lp["final_layer_norm"]
        return ffn_ln_fc1(
            checkpoint_name(x, "ffn_in").astype(dtype),
            lp["fc1"]["kernel"], lp["fc1"]["bias"],
            lnp["scale"], lnp["bias"], act_drop,
            lrng if act_drop > 0.0 else None,
        )
    h = checkpoint_name(
        _train_layer_norm(lp["final_layer_norm"], x, config), "ffn_in"
    )
    return _ffn_up(lp["fc1"], h, dtype, act_drop, lrng, config)


def _ffn_full(lp: dict, x: jnp.ndarray, dtype, act_drop: float, lrng,
              config) -> jnp.ndarray:
    """Whole FFN (LN + fc1 + GELU + dropout + fc2), pre-residual. With
    ``fused_ffn_block`` the chain is ONE custom_vjp block whose backward
    recomputes h and emits g on-MXU — the remat replay DCEs the FFN forward
    (ops/ffn_pallas.py ffn_ln_block)."""
    if getattr(config, "fused_ffn_block", False) and getattr(
        config, "fused_ffn", False
    ):
        from ..ops.ffn_pallas import ffn_ln_block

        lnp = lp["final_layer_norm"]
        return ffn_ln_block(
            checkpoint_name(x, "ffn_in").astype(dtype),
            lp["fc1"]["kernel"], lp["fc1"]["bias"],
            lnp["scale"], lnp["bias"],
            lp["fc2"]["kernel"], lp["fc2"]["bias"],
            act_drop, lrng if act_drop > 0.0 else None,
            dw_in_kernel=getattr(config, "fused_ffn_block_dw", False),
            fc2_in_kernel=getattr(config, "fused_ffn_block_fc2", False),
            dg_in_kernel=getattr(config, "fused_ffn_block_dg", False),
        )
    h = _ffn_block(lp, x, dtype, act_drop, lrng, config)
    return _dense(lp["fc2"], h, dtype)


def _attention(
    p: dict,
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    n_heads: int,
    dtype,
    mask: jnp.ndarray | None = None,
    is_causal: bool = False,
    impl: str = "xla",
) -> jnp.ndarray:
    """Multi-head attention; q/k/v from (possibly different) sources.

    ``mask`` is a boolean (B, 1, Tq, Tk) or (B, Tk) keep-mask. ``impl="flash"``
    routes unmasked non-causal self-attention through the blocked Pallas flash
    kernel — a clear win at the encoder's T=1500 (12 ms vs 21 ms value+grad
    per whisper-small layer at B=16); everything else stays on the XLA path.
    """
    self_attn = x_q is x_kv
    prefix = "" if self_attn else "cross_"
    q = checkpoint_name(
        _split_heads(_dense(p["q_proj"], x_q, dtype), n_heads),
        prefix + "q",
    )
    k = _split_heads(_dense(p["k_proj"], x_kv, dtype), n_heads)
    v = _split_heads(_dense(p["v_proj"], x_kv, dtype), n_heads)
    if self_attn:
        k = checkpoint_name(k, "k")
        v = checkpoint_name(v, "v")
    if (
        impl == "flash" and mask is None and not is_causal
        and q.shape[1] >= 1024 and jax.default_backend() == "tpu"
    ):
        from ..ops.flash_attention import flash_self_attention

        out = flash_self_attention(q, k, v)
    else:
        if mask is not None and mask.ndim == 2:
            mask = mask[:, None, None, :]
        out = jax.nn.dot_product_attention(
            q, k, v, mask=mask, is_causal=is_causal
        )
    out = checkpoint_name(_merge_heads(out), prefix + "attn_ctx")
    return _dense(p["out_proj"], out, dtype)


# --------------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------------


def _conv1d_ncw(x, kernel, bias, stride: int, dtype):
    """(B, T, C) conv with kernel (K, C_in, C_out), SAME-1 padding like torch."""
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + bias.astype(dtype)


def encode(
    params: dict,
    config: WhisperConfig,
    input_features: jnp.ndarray,
    deterministic: bool = True,
    rng: jax.Array | None = None,
    gradient_checkpointing: bool = False,
) -> jnp.ndarray:
    """Run the audio encoder.

    Args:
        input_features: (B, T_mel, n_mels) log-mel features (T_mel = 3000 for
            30 s parity with published checkpoints; any even T_mel compiles).

    Returns:
        (B, T_mel // 2, d_model) encoder states.
    """
    p = params["encoder"]
    dtype = config.dtype
    x = input_features

    if config.apply_spec_augment and not deterministic:
        assert rng is not None, "SpecAugment needs an rng"
        rng, sa_rng = jax.random.split(rng)
        x = _spec_augment(sa_rng, x, config)

    x = jax.nn.gelu(_conv1d_ncw(x, p["conv1"]["kernel"], p["conv1"]["bias"], 1,
                                dtype), approximate=False)
    x = jax.nn.gelu(_conv1d_ncw(x, p["conv2"]["kernel"], p["conv2"]["bias"], 2,
                                dtype), approximate=False)
    T = x.shape[1]
    x = x + p["embed_positions"][:T].astype(dtype)

    n_heads = config.encoder_attention_heads
    act_drop = 0.0 if deterministic else config.activation_dropout
    if act_drop > 0:
        assert rng is not None, "activation dropout needs an rng"
        rng, ffn_rng = jax.random.split(rng)
        layer_rngs = jax.random.split(ffn_rng, config.encoder_layers)
    else:
        layer_rngs = jnp.zeros(
            (config.encoder_layers,) + jax.random.PRNGKey(0).shape,
            jax.random.PRNGKey(0).dtype,
        )

    def layer(x, inputs):
        lp, lrng = inputs
        h = checkpoint_name(
            _train_layer_norm(lp["self_attn_layer_norm"], x, config), "attn_in"
        )
        x = x + _attention(
            lp["self_attn"], h, h, n_heads, dtype,
            impl=getattr(config, "encoder_attention_impl", "flash"),
        )
        x = x + _ffn_full(lp, x, dtype, act_drop, lrng, config)
        return x, None

    if gradient_checkpointing:
        layer = jax.checkpoint(
            layer,
            policy=REMAT_POLICIES[
                getattr(config, "remat_policy", "save_matmul_inputs")
            ],
        )
    x, _ = jax.lax.scan(layer, x, (p["layers"], layer_rngs))
    return _layer_norm(p["layer_norm"], x)


def _spec_augment(rng, feats: jnp.ndarray, config: WhisperConfig) -> jnp.ndarray:
    """Time/feature span masking on the mel features (train-time only)."""
    from .wav2vec2 import _span_mask

    B, T, F = feats.shape
    t_rng, f_rng = jax.random.split(rng)
    if config.mask_time_prob > 0:
        tmask = _span_mask(t_rng, B, T, config.mask_time_prob,
                           config.mask_time_length)
        feats = jnp.where(tmask[..., None], 0.0, feats)
    if config.mask_feature_prob > 0:
        fmask = _span_mask(f_rng, B, F, config.mask_feature_prob,
                           config.mask_feature_length)
        feats = jnp.where(fmask[:, None, :], 0.0, feats)
    return feats


# --------------------------------------------------------------------------------
# Decoder (teacher-forced training forward)
# --------------------------------------------------------------------------------


def decode_train(
    params: dict,
    config: WhisperConfig,
    encoder_out: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    deterministic: bool = True,
    rng: jax.Array | None = None,
    gradient_checkpointing: bool = False,
) -> jnp.ndarray:
    """Teacher-forced decoder forward.

    Args:
        encoder_out: (B, S, D) encoder states.
        decoder_input_ids: (B, L) token ids (already shifted right).

    Returns:
        (B, L, vocab) logits.
    """
    p = params["decoder"]
    dtype = config.dtype
    n_heads = config.decoder_attention_heads
    L = decoder_input_ids.shape[1]

    x = jnp.take(jnp.asarray(p["embed_tokens"]), decoder_input_ids, axis=0).astype(
        dtype
    )
    x = x + p["embed_positions"][:L].astype(dtype)
    if not deterministic and config.dropout > 0:
        assert rng is not None
        rng, drop_rng = jax.random.split(rng)
        x = _dropout(drop_rng, x, config.dropout, deterministic)

    act_drop = 0.0 if deterministic else config.activation_dropout
    if act_drop > 0:
        assert rng is not None, "activation dropout needs an rng"
        rng, ffn_rng = jax.random.split(rng)
        layer_rngs = jax.random.split(ffn_rng, config.decoder_layers)
    else:
        layer_rngs = jnp.zeros(
            (config.decoder_layers,) + jax.random.PRNGKey(0).shape,
            jax.random.PRNGKey(0).dtype,
        )

    def layer(x, inputs):
        lp, lrng = inputs
        h = checkpoint_name(
            _train_layer_norm(lp["self_attn_layer_norm"], x, config), "attn_in"
        )
        x = x + _attention(lp["self_attn"], h, h, n_heads, dtype, is_causal=True)
        h = checkpoint_name(
            _train_layer_norm(lp["encoder_attn_layer_norm"], x, config),
            "cross_in",
        )
        x = x + _attention(lp["encoder_attn"], h, encoder_out, n_heads, dtype)
        x = x + _ffn_full(lp, x, dtype, act_drop, lrng, config)
        return x, None

    if gradient_checkpointing:
        layer = jax.checkpoint(
            layer,
            policy=REMAT_POLICIES[
                getattr(config, "remat_policy", "save_matmul_inputs")
            ],
        )
    x, _ = jax.lax.scan(layer, x, (p["layers"], layer_rngs))
    x = _layer_norm(p["layer_norm"], x)
    # Tied output projection; logits in float32 for a stable softmax.
    return x.astype(jnp.float32) @ p["embed_tokens"].T.astype(jnp.float32)


def forward(
    params: dict,
    config: WhisperConfig,
    input_features: jnp.ndarray,
    decoder_input_ids: jnp.ndarray,
    deterministic: bool = True,
    rng: jax.Array | None = None,
    gradient_checkpointing: bool = False,
) -> jnp.ndarray:
    """Full training forward: (B, T_mel, mels) + (B, L) -> (B, L, vocab)."""
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    encoder_out = encode(
        params, config, input_features, deterministic, enc_rng,
        gradient_checkpointing,
    )
    return decode_train(
        params, config, encoder_out, decoder_input_ids, deterministic, dec_rng,
        gradient_checkpointing,
    )


# --------------------------------------------------------------------------------
# Autoregressive generation (jitted; lax.scan over positions, functional KV cache)
# --------------------------------------------------------------------------------


def precompute_cross_kv(
    params: dict, config: WhisperConfig, encoder_out: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cross-attention K/V for every decoder layer: (L, B, S, H*Dh) each.

    Heads stay FLAT on the last axis: a (..., S, H, Dh) layout tiles the
    (12, 64) minor dims at 2.7x on TPU, so the decode loop — which streams
    these tensors every step — would read 2.7x the bytes. The decode
    kernels (``ops/decode_attention.py``) slice heads on the lane axis.
    """
    dtype = config.dtype

    def per_layer(lp):
        h = encoder_out
        k = _dense(lp["encoder_attn"]["k_proj"], h, dtype)
        v = _dense(lp["encoder_attn"]["v_proj"], h, dtype)
        return k, v

    return jax.vmap(per_layer)(params["decoder"]["layers"])


def init_self_cache(
    config: WhisperConfig, batch: int, max_len: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zeroed self-attention KV cache: (L, B, max_len, H*Dh) x 2 (flat
    heads — see :func:`precompute_cross_kv`)."""
    shape = (
        config.decoder_layers, batch, max_len,
        config.decoder_attention_heads * config.head_dim,
    )
    return (jnp.zeros(shape, config.dtype), jnp.zeros(shape, config.dtype))


def decode_step(
    params: dict,
    config: WhisperConfig,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    self_cache: tuple[jnp.ndarray, jnp.ndarray],
    cross_kv: tuple[jnp.ndarray, jnp.ndarray],
    onehot: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray]]:
    """One decode position for the whole batch (all beams, when beamed).

    Args:
        tokens: (B*K,) current input token ids (K=1 for greedy).
        pos: scalar int32 position.
        self_cache: (L, B*K, max_len, H*Dh) keys/values (filled to ``pos``).
        cross_kv: per-layer (L, B, S, H*Dh) cross K/V from
            :func:`precompute_cross_kv`; the K beams of a batch item share
            them (no per-beam repeat is ever materialised).
        onehot: optional (B, K, K*max_len) slot-selection mask for beam
            search (ancestor chains x causal bound); None means greedy —
            a plain causal mask is built here.

    Returns:
        ((B*K, vocab) logits for the next token, updated cache).
    """
    p = params["decoder"]
    dtype = config.dtype
    n_heads = config.decoder_attention_heads
    cache_k, cache_v = self_cache
    n_layers, BK, max_len, _ = cache_k.shape
    cross_k, cross_v = cross_kv

    if onehot is None:
        onehot = jnp.broadcast_to(
            (jnp.arange(max_len) <= pos)[None, None, :].astype(jnp.float32),
            (BK, 1, max_len),
        )

    x = jnp.take(jnp.asarray(p["embed_tokens"]), tokens, axis=0).astype(dtype)
    x = x[:, None, :]  # (B*K, 1, D)
    x = x + jax.lax.dynamic_slice_in_dim(
        jnp.asarray(p["embed_positions"]), pos, 1, axis=0
    ).astype(dtype)

    # The caches travel WHOLE through the layer scan (carry, not xs/ys):
    # scanning over a stacked cache makes XLA materialise a per-layer slice
    # before the attention kernel and stitch the update back after it, plus
    # a full-cache copy per step for the restacked ys (measured ~1.1 s of a
    # 1.9 s whisper-small beam decode). Instead the new K/V rows go in with
    # one dynamic_update_slice on the stacked array and the kernels read
    # their layer via a scalar-prefetch block index.
    def layer(carry, inputs):
        x, cache_k, cache_v = carry
        lp, lidx = inputs
        h = _layer_norm(lp["self_attn_layer_norm"], x)
        q = _dense(lp["self_attn"]["q_proj"], h, dtype)[:, 0, :]
        k_new = _dense(lp["self_attn"]["k_proj"], h, dtype)  # (BK, 1, HD)
        v_new = _dense(lp["self_attn"]["v_proj"], h, dtype)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_new[None], (lidx, 0, pos, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_new[None], (lidx, 0, pos, 0)
        )
        attn = decode_self_attention(
            q, cache_k, cache_v, onehot, n_heads, lidx
        )
        x = x + _dense(lp["self_attn"]["out_proj"], attn[:, None, :], dtype)

        h = _layer_norm(lp["encoder_attn_layer_norm"], x)
        qc = _dense(lp["encoder_attn"]["q_proj"], h, dtype)[:, 0, :]
        a = decode_cross_attention(qc, cross_k, cross_v, n_heads, lidx)
        x = x + _dense(lp["encoder_attn"]["out_proj"], a[:, None, :], dtype)

        h = _layer_norm(lp["final_layer_norm"], x)
        h = jax.nn.gelu(_dense(lp["fc1"], h, dtype), approximate=False)
        x = x + _dense(lp["fc2"], h, dtype)
        return (x, cache_k, cache_v), None

    (x, new_k, new_v), _ = jax.lax.scan(
        layer, (x, cache_k, cache_v),
        (p["layers"], jnp.arange(n_layers, dtype=jnp.int32)),
    )
    x = _layer_norm(p["layer_norm"], x)
    logits = x[:, 0, :].astype(jnp.float32) @ p["embed_tokens"].T.astype(
        jnp.float32
    )
    return logits, (new_k, new_v)


def _decode_phases(max_length: int) -> list[int]:
    """Cache-length buckets for the phased decode loop.

    The decode attention kernels stream the WHOLE self-attention cache
    every step (a Pallas grid is static), so a single while_loop over a
    max_length-sized cache reads ~2x the useful KV bytes on average
    (useful fraction = (pos+1)/max_length). Instead the loop runs in
    phases: the cache (and the beam slot mask) is allocated at the bucket
    size, zero-padded up between phases, and each phase's while_loop stops
    at its bucket bound. Semantics are identical — the set of attended
    rows per step is unchanged (HF generation parity stays pinned by
    tests/test_hf_generation_parity.py).

    Buckets double from 64: [64, 128, ..., max_length]. Env
    ``CORAL_DECODE_PHASED=0`` restores the single full-length loop (A/B).
    """
    if os.environ.get("CORAL_DECODE_PHASED", "1") == "0" or max_length <= 64:
        return [max_length]
    phases, t = [], 64
    while t < max_length:
        phases.append(t)
        t *= 2
    phases.append(max_length)
    return phases


def _pad_cache(cache: tuple[jnp.ndarray, jnp.ndarray], new_len: int):
    k, v = cache
    extra = new_len - k.shape[2]
    if extra == 0:
        return cache
    pad = [(0, 0), (0, 0), (0, extra), (0, 0)]
    return jnp.pad(k, pad), jnp.pad(v, pad)


def greedy_generate(
    params: dict,
    config: WhisperConfig,
    input_features: jnp.ndarray,
    forced_ids: jnp.ndarray,
    max_length: int,
    eos_id: int,
    suppress_ids: jnp.ndarray | None = None,
    timestamps: bool = False,
    timestamp_begin: int | None = None,
) -> jnp.ndarray:
    """Greedy decoding under jit.

    Args:
        input_features: (B, T_mel, mels).
        forced_ids: (n_forced,) decoder prompt — ``[sot, lang, task,
            notimestamps]`` — teacher-forced before free decoding starts.
        max_length: Total output length including the prompt (static).
        eos_id: End-of-text id; finished rows keep emitting ``eos_id``.
        suppress_ids: Optional (n,) token ids never to emit (reference clears the
            HF defaults, src/coral/whisper.py:103-104, so None matches).

    Returns:
        (B, max_length) generated ids, prompt included, eos-padded.
    """
    B = input_features.shape[0]
    forced_ids = jnp.asarray(forced_ids, dtype=jnp.int32)
    n_forced = forced_ids.shape[0]
    encoder_out = encode(params, config, input_features, deterministic=True)
    cross_kv = precompute_cross_kv(params, config, encoder_out)
    phases = _decode_phases(max_length)
    cache = init_self_cache(config, B, phases[0])

    tokens0 = jnp.full((B,), forced_ids[0], dtype=jnp.int32)
    # Output buffer pre-filled with EOS; positions past early exit stay EOS.
    buffer0 = jnp.full((B, max_length), eos_id, dtype=jnp.int32)
    buffer0 = buffer0.at[:, 0].set(tokens0)

    def make_cond(end):
        def cond(carry):
            pos, _, _, _, finished = carry
            # Early exit once every row emitted EOS (after the forced
            # prompt); ``end`` bounds this phase's cache bucket.
            return (pos < end) & ~jnp.all(finished)
        return cond

    def body(carry):
        pos, tokens, buffer, cache, finished = carry
        logits, cache = decode_step(params, config, tokens, pos, cache, cross_kv)
        if suppress_ids is not None:
            logits = logits.at[:, suppress_ids].set(-jnp.inf)
        if timestamps:
            logits = apply_timestamp_rules(
                logits, buffer, pos, n_forced, timestamp_begin, eos_id
            )
        sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # While inside the forced prompt, the "prediction" is the next forced id.
        next_token = jnp.where(
            pos + 1 < n_forced,
            forced_ids[jnp.minimum(pos + 1, n_forced - 1)],
            sampled,
        )
        next_token = jnp.where(finished, eos_id, next_token)
        finished = finished | (next_token == eos_id)
        buffer = jax.lax.dynamic_update_slice(
            buffer, next_token[:, None], (0, pos + 1)
        )
        return pos + 1, next_token, buffer, cache, finished

    finished0 = jnp.zeros((B,), dtype=bool)
    carry = (jnp.asarray(0, jnp.int32), tokens0, buffer0, cache, finished0)
    for t_b in phases:
        carry = (*carry[:3], _pad_cache(carry[3], t_b), carry[4])
        carry = jax.lax.while_loop(
            make_cond(min(t_b, max_length - 1)), body, carry
        )
    return carry[2]  # (B, max_length), EOS-padded


# --------------------------------------------------------------------------------
# Timestamp decoding rules (HF WhisperTimeStampLogitsProcessor semantics)
# --------------------------------------------------------------------------------


def apply_timestamp_rules(
    logits: jnp.ndarray,
    buffer: jnp.ndarray,
    pos: jnp.ndarray,
    n_forced: int,
    timestamp_begin: int,
    eos_id: int,
    max_initial_index: int = 50,
) -> jnp.ndarray:
    """Constrain next-token logits to Whisper's timestamp grammar.

    Mirrors the HF/openai-whisper timestamp logits processor, which the HF
    pipeline applies for ``return_timestamps`` long-form decoding (the
    reference reaches it through the ASR pipeline, reference:
    ``src/coral/evaluate.py:47-74``): timestamps open every segment, appear in
    non-decreasing pairs, ``<|notimestamps|>`` is never emitted, the first
    timestamp is clamped to ``max_initial_index`` (1 s by default), and when
    the total probability mass on timestamps beats the best text token the
    next token is forced to be a timestamp.

    Args:
        logits: (N, V) next-token logits (position ``pos + 1``).
        buffer: (N, L) token buffer filled up to ``pos`` inclusive.
        pos: scalar current position.
        n_forced: prompt length (timestamp grammar starts after it).
        timestamp_begin: id of ``<|0.00|>``.
        eos_id: end-of-text id (ids below it are normal text).
        max_initial_index: highest timestamp offset allowed first.

    Returns:
        Masked logits, same shape.
    """
    N, V = logits.shape
    L = buffer.shape[1]
    neg = jnp.asarray(-1e30, logits.dtype)
    vocab = jnp.arange(V)
    is_ts = vocab >= timestamp_begin  # (V,)
    is_text = vocab < eos_id

    gen_len = pos + 1 - n_forced  # generated tokens so far (scalar)
    last = buffer[:, pos]
    penult = buffer[:, jnp.maximum(pos - 1, 0)]
    last_was_ts = (gen_len >= 1) & (last >= timestamp_begin)
    penult_was_ts = (gen_len < 2) | (penult >= timestamp_begin)

    # A completed pair must be followed by text; a lone timestamp may only be
    # followed by its pair (or EOS).
    suppress_ts = last_was_ts & penult_was_ts
    force_pair = last_was_ts & ~penult_was_ts
    logits = jnp.where(suppress_ts[:, None] & is_ts[None, :], neg, logits)
    logits = jnp.where(force_pair[:, None] & is_text[None, :], neg, logits)

    # Timestamps never decrease. While completing a pair an equal timestamp is
    # allowed; otherwise the next one must be strictly larger. HF cuts at the
    # LAST emitted timestamp (not the max — they only coincide for
    # grammar-valid prefixes), so match that exactly.
    posmask = (jnp.arange(L) >= n_forced) & (jnp.arange(L) <= pos)
    ts_at = posmask[None, :] & (buffer >= timestamp_begin)
    last_p = jnp.max(
        jnp.where(ts_at, jnp.arange(L)[None, :], -1), axis=1
    )  # (N,), -1 when none yet
    has_ts = last_p >= 0
    last_ts = jnp.take_along_axis(
        buffer, jnp.maximum(last_p, 0)[:, None], axis=1
    )[:, 0]
    cutoff = jnp.where(force_pair, last_ts, last_ts + 1)
    below = vocab[None, :] < cutoff[:, None]
    logits = jnp.where(
        has_ts[:, None] & is_ts[None, :] & below, neg, logits
    )

    # The transcript opens with a timestamp, clamped to max_initial_index.
    at_begin = gen_len == 0
    logits = jnp.where(at_begin & ~is_ts[None, :], neg, logits)
    logits = jnp.where(
        at_begin & (vocab > timestamp_begin + max_initial_index)[None, :],
        neg, logits,
    )

    # <|notimestamps|> is incompatible with timestamp decoding.
    logits = logits.at[:, timestamp_begin - 1].set(neg)

    # Probability-mass rule: if timestamps jointly out-weigh the best text
    # token, force a timestamp.
    logp = jax.nn.log_softmax(logits, axis=-1)
    ts_mass = jax.nn.logsumexp(
        jnp.where(is_ts[None, :], logp, -jnp.inf), axis=-1
    )
    best_text = jnp.max(jnp.where(is_ts[None, :], -jnp.inf, logp), axis=-1)
    force_ts = ts_mass > best_text
    logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], neg, logits)
    return logits


def segments_from_tokens(
    ids, timestamp_begin: int, eos_id: int, time_precision: float = 0.02
) -> list[tuple[float, float, list[int]]]:
    """Split a generated id sequence into timed segments.

    Args:
        ids: iterable of token ids (one utterance, prompt may be included).
        timestamp_begin: id of ``<|0.00|>``.
        eos_id: generation stops here.
        time_precision: seconds per timestamp step (Whisper: 0.02).

    Returns:
        List of (start_seconds, end_seconds, text_token_ids) tuples.
    """
    segments = []
    start = None
    current: list[int] = []
    for raw in ids:
        t = int(raw)
        if t == eos_id:
            break
        if t >= timestamp_begin:
            seconds = (t - timestamp_begin) * time_precision
            if start is None:
                start = seconds
            elif current:
                segments.append((start, seconds, current))
                current = []
                start = None
            else:
                start = seconds  # consecutive timestamps: new segment start
        elif start is not None:
            current.append(t)
    if current and start is not None:
        segments.append((start, start, current))
    return segments


# --------------------------------------------------------------------------------
# Beam search generation (jitted; beams flattened into the batch axis)
# --------------------------------------------------------------------------------


def beam_generate(
    params: dict,
    config: WhisperConfig,
    input_features: jnp.ndarray,
    forced_ids: jnp.ndarray,
    max_length: int,
    eos_id: int,
    num_beams: int = 5,
    length_penalty: float = 1.0,
    early_stopping: bool | str = False,
    timestamps: bool = False,
    timestamp_begin: int | None = None,
    suppress_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Beam-search decoding fully under jit, matching HF ``_beam_search``.

    Mirrors transformers' vectorised beam search step for step (the surface
    the reference reaches via ``predict_with_generate``, reference:
    ``src/coral/whisper.py:214-230``): log-probs are processed (token
    suppression, timestamp grammar) *after* the softmax without
    renormalising, 2*K candidate continuations are drawn per batch item,
    finished hypotheses move to a separate K-slot store guarded by HF's
    ``-1e9`` additions, finished scores normalise by generated length
    (prompt excluded, EOS included) ** ``length_penalty``, and the loop
    stops on HF's improvement heuristic (``early_stopping``
    False / True / "never"). ``num_beams=1`` routes to greedy exactly as
    HF ``generate`` does. Pinned token-for-token against
    ``WhisperForConditionalGeneration.generate(num_beams=...)`` in
    ``tests/test_hf_generation_parity.py``.

    The KV cache is never reordered: beams carry ancestor index chains
    resolved inside the decode attention kernel through a slot-selection
    mask (``ops/decode_attention.py``), replacing the per-step O(max_len)
    cache gather with O(1) index bookkeeping.

    Returns:
        (B, max_length) best sequences, prompt included, EOS-padded.
    """
    if num_beams == 1:
        return greedy_generate(
            params, config, input_features, forced_ids, max_length, eos_id,
            suppress_ids=suppress_ids, timestamps=timestamps,
            timestamp_begin=timestamp_begin,
        )

    B = input_features.shape[0]
    K = num_beams
    K2 = 2 * K  # HF beams_to_keep = max(2, 1 + n_eos_tokens) * num_beams
    forced_ids = jnp.asarray(forced_ids, dtype=jnp.int32)
    n_forced = forced_ids.shape[0]
    V = params["decoder"]["embed_tokens"].shape[0]
    penalty = jnp.asarray(length_penalty, jnp.float32)

    encoder_out = encode(params, config, input_features, deterministic=True)
    cross_kv = precompute_cross_kv(params, config, encoder_out)
    phases = _decode_phases(max_length)
    cache0 = init_self_cache(config, B * K, phases[0])

    tokens0 = jnp.full((B * K,), forced_ids[0], dtype=jnp.int32)
    run_seq0 = jnp.full((B, K, max_length), eos_id, jnp.int32)
    run_seq0 = run_seq0.at[:, :, 0].set(forced_ids[0])
    # Only beam 0 carries probability mass at the start (HF: -1e9 fill).
    run_scores0 = jnp.full((B, K), -1e9, jnp.float32).at[:, 0].set(0.0)
    fin_seq0 = jnp.full((B, K, max_length), eos_id, jnp.int32)
    fin_scores0 = jnp.full((B, K), -1e9, jnp.float32)
    is_fin0 = jnp.zeros((B, K), dtype=bool)
    unsat0 = jnp.ones((B, 1), dtype=bool)  # early-stop heuristic state
    hits0 = jnp.zeros((B, K2), dtype=bool)
    anc0 = jnp.tile(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, 1, max_length)
    )
    slot_ids = jnp.tile(
        jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, 1, 1)
    )
    top_beam_mask = jnp.arange(K2) < K  # first K of the 2K candidates

    def make_cond(end):
        def cond(carry):
            pos = carry[0]
            is_fin, unsat, hits = carry[6], carry[7], carry[8]
            improvement_possible = jnp.any(unsat)
            if early_stopping is True:
                exists_open = ~jnp.all(is_fin)
            else:
                exists_open = jnp.asarray(True)
            valid_continuations = ~jnp.all(hits)
            return (
                (pos < end)
                & improvement_possible & exists_open & valid_continuations
            )
        return cond

    def body(carry):
        (pos, tokens, run_seq, run_scores, fin_seq, fin_scores,
         is_fin, unsat, hits, anc, cache) = carry
        # Slot-selection mask from the ancestor chains: beam k of batch b
        # may attend slot j at position t iff its history there lives in j
        # (and t <= pos). Layer-independent — built once per step. Sized
        # to the current phase's cache bucket (``_decode_phases``), as is
        # everything the decode kernels stream per step.
        t_b = cache[0].shape[2]
        onehot = (
            (anc[:, :, None, :t_b] == jnp.arange(K)[None, None, :, None])
            & (jnp.arange(t_b)[None, None, None, :] <= pos)
        ).reshape(B, K, K * t_b).astype(jnp.float32)
        logits, new_cache = decode_step(
            params, config, tokens, pos, cache, cross_kv, onehot
        )  # (B*K, V)

        def forced_branch(_):
            nxt = jnp.full(
                (B * K,), forced_ids[jnp.minimum(pos + 1, n_forced - 1)],
                jnp.int32,
            )
            seq = jax.lax.dynamic_update_slice(
                run_seq, nxt.reshape(B, K, 1), (0, 0, pos + 1)
            )
            return (nxt, seq, run_scores, fin_seq, fin_scores, is_fin,
                    unsat, hits, anc)

        def free_branch(_):
            if timestamps:
                # The timestamp grammar inspects the full distribution
                # (probability aggregates over the timestamp block), so the
                # whole log-prob tensor is materialised on this path.
                # HF processes log-probs, not logits; masks do NOT
                # renormalise.
                logp = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1
                )
                if suppress_ids is not None:
                    logp = logp.at[:, suppress_ids].set(-jnp.inf)
                logp = apply_timestamp_rules(
                    logp, run_seq.reshape(B * K, max_length), pos, n_forced,
                    timestamp_begin, eos_id,
                )
                cand = logp.reshape(B, K, V) + run_scores[:, :, None]
                scores2k, flat_idx = jax.lax.top_k(
                    cand.reshape(B, K * V), K2
                )
                parent = flat_idx // V  # (B, K2)
                token = (flat_idx % V).astype(jnp.int32)
            else:
                # Exact two-stage top-k: the global top-K2 of
                # ``logp + run_score`` contains at most K2 entries from any
                # one beam row, and within a row the +run_score/-lse shift
                # is monotone — so a per-row top-K2 on RAW logits (the full
                # (B*K, V) log_softmax never materialises) followed by a
                # (B, K*K2) combine reproduces HF's flat top-k. The lse is
                # computed over the UNSUPPRESSED logits (HF suppresses
                # after the softmax, without renormalising); suppression
                # only has to keep those ids out of the selection.
                logits32 = logits.astype(jnp.float32)
                lse = jax.nn.logsumexp(logits32, axis=-1, keepdims=True)
                sel_from = (
                    logits32.at[:, suppress_ids].set(-jnp.inf)
                    if suppress_ids is not None else logits32
                )
                vals, idx = jax.lax.top_k(sel_from, K2)  # (B*K, K2) each
                logp_top = vals - lse
                cand = (
                    logp_top.reshape(B, K, K2) + run_scores[:, :, None]
                )
                scores2k, sel = jax.lax.top_k(cand.reshape(B, K * K2), K2)
                parent = sel // K2  # (B, K2)
                token = jnp.take_along_axis(
                    idx.reshape(B, K * K2), sel, axis=1
                ).astype(jnp.int32)

            seq2k = jnp.take_along_axis(run_seq, parent[:, :, None], axis=1)
            seq2k = jax.lax.dynamic_update_slice(
                seq2k, token[:, :, None], (0, 0, pos + 1)
            )
            anc2k = jnp.take_along_axis(anc, parent[:, :, None], axis=1)

            # Stopping criteria on all 2K candidates (EOS / max length).
            hits_new = (token == eos_id) | ((pos + 2) >= max_length)

            # Running beams for the next step: top K non-finished; the -1e9
            # stays folded into the carried scores, as in HF.
            masked = scores2k + hits_new.astype(jnp.float32) * -1e9
            _, idx_r = jax.lax.top_k(masked, K)
            run_seq_n = jnp.take_along_axis(seq2k, idx_r[:, :, None], axis=1)
            run_scores_n = jnp.take_along_axis(masked, idx_r, axis=1)
            anc_n = jnp.take_along_axis(anc2k, idx_r[:, :, None], axis=1)
            # Next decode writes KV at pos+1 into each slot's own row.
            anc_n = jax.lax.dynamic_update_slice(
                anc_n, slot_ids, (0, 0, pos + 1)
            )
            tokens_n = jnp.take_along_axis(token, idx_r, axis=1).reshape(
                B * K
            )

            # Finished-store update (HF _update_finished_beams).
            did_fin = hits_new & top_beam_mask[None, :]
            gen_len = (pos + 2 - n_forced).astype(jnp.float32)
            lp_fin = scores2k / (gen_len ** penalty)
            if early_stopping is True:
                full = jnp.all(is_fin, axis=-1, keepdims=True)
                lp_fin = lp_fin + full.astype(jnp.float32) * -1e9
            lp_fin = lp_fin + (~unsat).astype(jnp.float32) * -1e9
            lp_fin = lp_fin + (~did_fin).astype(jnp.float32) * -1e9
            merged_seq = jnp.concatenate([fin_seq, seq2k], axis=1)
            merged_scores = jnp.concatenate([fin_scores, lp_fin], axis=1)
            merged_fin = jnp.concatenate([is_fin, did_fin], axis=1)
            _, idx_f = jax.lax.top_k(merged_scores, K)
            fin_seq_n = jnp.take_along_axis(
                merged_seq, idx_f[:, :, None], axis=1
            )
            fin_scores_n = jnp.take_along_axis(merged_scores, idx_f, axis=1)
            is_fin_n = jnp.take_along_axis(merged_fin, idx_f, axis=1)

            # Early-stop heuristic for the NEXT iteration (HF
            # _check_early_stop_heuristic, evaluated at cur_len = pos + 2).
            if early_stopping == "never" and length_penalty > 0.0:
                best_len = jnp.asarray(max_length - n_forced, jnp.float32)
            else:
                best_len = gen_len
            best_possible = run_scores_n[:, :1] / (best_len ** penalty)
            worst_fin = jnp.where(
                is_fin_n,
                jnp.min(fin_scores_n, axis=1, keepdims=True),
                -1e9,
            )
            unsat_n = unsat & jnp.any(
                best_possible > worst_fin, axis=-1, keepdims=True
            )
            return (tokens_n, run_seq_n, run_scores_n, fin_seq_n,
                    fin_scores_n, is_fin_n, unsat_n, hits_new, anc_n)

        (tokens_n, run_seq_n, run_scores_n, fin_seq_n, fin_scores_n,
         is_fin_n, unsat_n, hits_n, anc_n) = jax.lax.cond(
            pos + 1 < n_forced, forced_branch, free_branch, operand=None
        )
        return (pos + 1, tokens_n, run_seq_n, run_scores_n, fin_seq_n,
                fin_scores_n, is_fin_n, unsat_n, hits_n, anc_n, new_cache)

    final = (jnp.asarray(0, jnp.int32), tokens0, run_seq0, run_scores0,
             fin_seq0, fin_scores0, is_fin0, unsat0, hits0, anc0, cache0)
    for t_b in phases:
        final = (*final[:10], _pad_cache(final[10], t_b))
        final = jax.lax.while_loop(
            make_cond(min(t_b, max_length - 1)), body, final
        )
    # The finished store is sorted by score descending; slot 0 is the best.
    return final[4][:, 0, :]
