"""wav2vec2 encoder + CTC head, TPU-native flax implementation.

The reference fine-tunes HF ``Wav2Vec2ForCTC`` checkpoints (XLS-R 300m/1b/2b,
reference: ``src/coral/wav2vec2.py:104-133`` and ``config/model/wav2vec2-*.yaml``).
This is a ground-up flax implementation of the same architecture, designed for XLA:

- the 24/48 identical transformer layers run under ``nn.scan`` (one compiled layer
  body, stacked (L, ...) parameters) with optional ``nn.remat`` for gradient
  checkpointing;
- attention uses ``jax.nn.dot_product_attention`` so XLA can pick a fused kernel;
- SpecAugment time/feature masking is computed on-device from PRNG keys
  (equivalent coverage semantics to HF's ``_compute_mask_indices``, reference
  behaviour configured at ``src/coral/wav2vec2.py:114-118``);
- all shapes are static; sample lengths travel as explicit length arrays.

Weight layout intentionally mirrors the HF module tree closely enough that
``coral_tpu.models.convert`` can map checkpoints 1:1 (per-layer tensors are stacked
along a leading layer axis for the scanned encoder).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture hyperparameters (defaults = XLS-R 300m)."""

    vocab_size: int = 46
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple[int, ...] = (512,) * 7
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True
    feat_extract_norm: str = "layer"  # "layer" (XLS-R) or "group" (base)
    layer_norm_eps: float = 1e-5
    # Dropouts (reference config surface: config/model/wav2vec2-*.yaml)
    hidden_dropout: float = 0.0
    activation_dropout: float = 0.1
    attention_dropout: float = 0.0
    feat_proj_dropout: float = 0.0
    final_dropout: float = 0.0
    layerdrop: float = 0.0
    # SpecAugment
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.5
    mask_time_length: int = 10
    mask_feature_prob: float = 0.5
    mask_feature_length: int = 64
    # Numerics
    dtype: Any = jnp.float32  # compute dtype (bfloat16 for TPU training)
    # Attention backend:
    #   "pallas" — fused short-T kernel (ops/attention_pallas.py): the whole
    #     (T, T) score matrix lives in VMEM per (batch, head), backward
    #     recomputes probabilities on-MXU. Measured on v5e at B=32, T=499,
    #     head_dim=64: 3.7 ms value+grad vs 7.0 ms for the XLA path.
    #   "xla" — jax.nn.dot_product_attention (compiler-fused, any shape).
    #   "flash" — blocked Pallas flash attention; only pays off at much
    #     longer sequences than 10 s clips (measured 321 vs 538 audio-s/s).
    attention_impl: str = "pallas"
    # Save the attention forward's log-sum-exp as a VJP residual so the
    # backward skips the softmax max/sum/divide recompute passes. Only
    # profitable with remat policies that replay the forward anyway
    # (nothing_saveable); named-checkpoint policies would replay the fwd
    # kernel to rebuild the extra residual.
    # False | True (v1: transposed-space fwd+bwd) | "v2" (normal-space fwd
    # + lse relayout, v1 transposed-space bwd) | "v3" (v2's fwd; bwd also
    # reads o — the policy-saved "attn_ctx" — for the flash
    # delta = rowsum(do * o) identity, dropping the (T, T) sum(p * dp)
    # multiply+reduce; pair with save_qk_ctx / save_attn_ctx_lse which save
    # both residuals anyway).
    attention_save_stats: bool | str = False
    # Save the attention output o as a VJP residual (it is the same flat
    # tensor as the "attn_ctx" checkpoint, so policies saving attn_ctx cover
    # it and nothing_saveable's replay produces it anyway) and use the
    # flash-style delta = rowsum(do * o) backward — one (T, d) pass instead
    # of the (T, T) sum(p * dp) multiply+reduction. MEASURED SLOWER on the
    # round-4 A/B (864.1 vs 871.3 audio-s/s at B=48: the backward's extra
    # 49 MB/layer o read and the 9th double-buffered slab outweigh the saved
    # (T, T) pass), so the default stays the recompute backward; the variant
    # remains one flag away.
    attention_o_residual: bool = False
    # Feature encoder: fuse each stride-2 conv block with its LayerNorm+GELU
    # into one Pallas pass (ops/conv_ln_gelu_pallas.py). False = XLA conv +
    # the fused LN+GELU kernel.
    fused_fe_conv: bool = True
    # Encoder (transformer) LayerNorms: "pallas" = the one-pass ln_fused
    # kernel (776 -> 778 audio-s/s round 3), "xla" = nn.LayerNorm (XLA fuses
    # them with the residual adds — was the round-2 winner).
    encoder_ln_impl: str = "pallas"
    # Fuse the FFN up-projection with its GELU(+dropout) epilogue so the
    # 4x-wide pre-activation never leaves VMEM (ops/ffn_pallas.py). False =
    # nn.Dense + the split gelu_dropout kernel.
    fused_ffn: bool = False
    # Additionally fold the pre-FFN LayerNorm into the fused kernel (pre-LN
    # architecture only; the LN has a single consumer). Requires fused_ffn.
    fused_ffn_ln: bool = False
    # Run the WHOLE FFN (LN + fc1 + GELU + dropout + fc2) as one
    # differentiable block (ops/ffn_pallas.py ffn_ln_block): the block's VJP
    # residuals are primal inputs only and its backward kernel emits the
    # post-activation g (the dW2 operand) while recomputing h on-MXU, so the
    # remat replay DCEs the FFN forward entirely — 7 same-size matmuls per
    # layer instead of 8. Requires fused_ffn; composes with fused_ffn_ln.
    fused_ffn_block: bool = False
    # With fused_ffn_block: accumulate dW1/dW2 on-MXU inside the backward
    # kernel (VMEM-resident fp32 blocks; g/dh/ln_out never return to HBM).
    fused_ffn_block_dw: bool = False
    # With fused_ffn_block: fold fc2 into the forward kernel too (g never
    # touches HBM in the forward; backward unchanged).
    fused_ffn_block_fc2: bool = False
    # With fused_ffn_block: compute dg = dy @ W2^T inside the backward
    # kernel (reads dy, 49 MB/layer, instead of dg, 196 MB).
    fused_ffn_block_dg: bool = False
    # Fold the pre-attention LayerNorm into a packed QKV projection kernel
    # (ops/ffn_pallas.py ln_dense): one (D, 3D) matmul with the LN computed
    # in-register, removing the separate LN kernels and the normalised
    # tensor's HBM round-trips (pre-LN architecture only; the LN has a
    # single consumer).
    fused_qkv_ln: bool = False
    # Apply the q/k/v PROJECTION biases inside the attention kernel: the
    # Dense projections run bias-free and the (D,) biases ride into the
    # kernel, whose backward emits dbq/dbk/dbv as in-register row sums —
    # XLA otherwise re-reads the 3 (B, T, D) projection cotangents from HBM
    # (~0.2 ms/layer at B=48 x 10 s, measured at HBM peak) just for the
    # bias grads. Requires attention_impl="pallas" +
    # attention_save_stats="v3"; mutually exclusive with fused_qkv_ln
    # (which already owns the biases). Bit-identical values.
    attention_fused_qkv_bias: bool = False
    # Positional conv via a factor-2 space-to-depth fold: the (k, C/g -> C/g)
    # grouped conv becomes a (k/2+1, 2C/g -> 2C/g) conv at half the sequence
    # length — identical FLOPs but full 128-lane MXU tiles instead of the
    # quarter tiles a 64-channel group gets (profiled at 3x its flop floor).
    pos_conv_fold: bool = False

    @classmethod
    def xls_r_300m(cls, vocab_size: int = 46, **kw) -> "Wav2Vec2Config":
        return cls(vocab_size=vocab_size, **kw)

    @classmethod
    def xls_r_1b(cls, vocab_size: int = 46, **kw) -> "Wav2Vec2Config":
        return cls(
            vocab_size=vocab_size, hidden_size=1280, num_hidden_layers=48,
            num_attention_heads=16, intermediate_size=5120, **kw,
        )

    @classmethod
    def xls_r_2b(cls, vocab_size: int = 46, **kw) -> "Wav2Vec2Config":
        return cls(
            vocab_size=vocab_size, hidden_size=1920, num_hidden_layers=48,
            num_attention_heads=16, intermediate_size=7680, **kw,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 46, **kw) -> "Wav2Vec2Config":
        """A tiny config for tests.

        The conv strides keep the production 320x downsampling ratio — a
        smaller ratio floods the CTC recursion with 30x more frames and makes
        CPU-hosted tests crawl.
        """
        return cls(
            vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            conv_dim=(16, 16, 16, 16), conv_stride=(5, 4, 4, 4),
            conv_kernel=(10, 3, 3, 3),
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2, **kw,
        )

    def feat_extract_output_lengths(self, input_lengths: jnp.ndarray) -> jnp.ndarray:
        """Map raw-audio lengths to feature-frame lengths through the conv stack."""
        lengths = input_lengths
        for kernel, stride in zip(self.conv_kernel, self.conv_stride):
            lengths = (lengths - kernel) // stride + 1
        return lengths


def _conv1d(x, kernel, bias, stride: int = 1, padding=0, groups: int = 1,
            dtype=jnp.float32):
    """1D convolution on (B, T, C) with kernel (K, C_in/groups, C_out)."""
    pad = padding if isinstance(padding, (list, tuple)) else [(padding, padding)]
    K, c_in, c_out = kernel.shape
    if (
        groups == 1 and c_in == 1 and K % stride == 0 and pad == [(0, 0)]
        and x.shape[1] % stride == 0 and K > stride
    ):
        # Waveform layer (C_in=1, e.g. XLS-R L0: k=10, s=5): the strided conv
        # is exactly a (T/s, s)-fold reshape + k/s shifted lane-slab concats +
        # ONE dense matmul. XLA's native conv lowering for this shape emits
        # {2,0,1} layout copies on the (B, T/s, C_out) output (~9.5 ms/step at
        # B=32 x 10 s, round-3 profile); this form comes straight out of the
        # matmul emitter in the natural layout. (The same trick LOSES for the
        # C_in=512 layers — see the note below — because there the patch
        # tensor is K*C wide; here it is K floats per row.)
        B, T, _ = x.shape
        m = K // stride
        z = x.astype(dtype).reshape(B, T // stride, stride)
        n_out = T // stride - m + 1
        p = jnp.concatenate([z[:, i : i + n_out] for i in range(m)], axis=-1)
        out = jax.lax.dot_general(
            p, kernel.astype(dtype).reshape(K, c_out),
            (((2,), (0,)), ((), ())),
        )
        if bias is not None:
            out = out + bias.astype(dtype)
        return out
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride,),
        padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


# Note: expressing these convs as strided-slice patches + one MXU matmul was
# measured SLOWER end-to-end (745 -> 411 audio-s/s at B=32 x 10 s): the
# materialised (B, T, K*C) patch tensors cost more HBM traffic than XLA's
# slow conv-dW reduce fusions save. Keep the native conv lowering.


class _LayerNormParams(nn.Module):
    """Bare LayerNorm parameters on the same tree path as ``nn.LayerNorm``
    (the normalisation itself runs in the fused Pallas kernel)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return scale, bias


class ConvLayer(nn.Module):
    """One feature-encoder conv block: conv -> (layer norm) -> gelu."""

    out_dim: int
    kernel: int
    stride: int
    use_bias: bool
    use_layer_norm: bool
    use_group_norm: bool
    eps: float
    dtype: Dtype
    fuse_conv: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param(
            "conv_kernel", nn.initializers.he_normal(),
            (self.kernel, in_dim, self.out_dim), jnp.float32,
        )
        bias = (
            self.param("conv_bias", nn.initializers.zeros, (self.out_dim,),
                       jnp.float32)
            if self.use_bias else None
        )
        if (
            self.fuse_conv and self.use_layer_norm and self.stride == 2
            and self.kernel in (2, 3) and in_dim == self.out_dim
            and in_dim % 128 == 0
        ):
            # Whole block in one Pallas pass: stride-2 conv as deinterleaved
            # full-width MXU matmuls + fp32 LayerNorm stats + exact GELU,
            # no HBM round-trips for the conv output or the normalised
            # tensor (ops/conv_ln_gelu_pallas.py).
            from ..ops.conv_ln_gelu_pallas import conv_ln_gelu

            gamma, beta = _LayerNormParams(self.out_dim, name="layer_norm")()
            b = bias if bias is not None else jnp.zeros(
                (self.out_dim,), jnp.float32
            )
            return conv_ln_gelu(
                x.astype(self.dtype), kernel, b, gamma, beta, eps=self.eps
            ).astype(self.dtype)
        x = checkpoint_name(
            _conv1d(x, kernel, bias, stride=self.stride, dtype=self.dtype),
            "conv_raw",
        )
        if self.use_layer_norm:
            # Fused Pallas LayerNorm+GELU (one pass per direction; fp32 stats
            # in VMEM) — XLA's split lowering round-trips fp32 stat tensors
            # through HBM on these (B, ~32000, 512) blocks. Parameters keep
            # the nn.LayerNorm tree path for checkpoint-converter parity.
            from ..ops.ln_gelu_pallas import ln_gelu

            gamma, beta = _LayerNormParams(self.out_dim, name="layer_norm")()
            return ln_gelu(x, gamma, beta, eps=self.eps).astype(self.dtype)
        elif self.use_group_norm:
            x = nn.GroupNorm(
                num_groups=self.out_dim, epsilon=self.eps, dtype=self.dtype,
                name="group_norm",
            )(x)
        return jax.nn.gelu(x, approximate=False)


class FeatureEncoder(nn.Module):
    """Raw waveform (B, T) -> conv features (B, T', C)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x[..., None]  # (B, T, 1)
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            x = ConvLayer(
                out_dim=dim, kernel=k, stride=s, use_bias=cfg.conv_bias,
                use_layer_norm=cfg.feat_extract_norm == "layer",
                use_group_norm=cfg.feat_extract_norm == "group" and i == 0,
                eps=cfg.layer_norm_eps, dtype=cfg.dtype,
                fuse_conv=cfg.fused_fe_conv, name=f"conv_layers_{i}",
            )(x)
        return x


class FeatureProjection(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                         name="layer_norm")(x)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="projection")(x)
        x = nn.Dropout(cfg.feat_proj_dropout)(x, deterministic=deterministic)
        return x


def _pos_conv_folded(x, kernel, bias, groups: int, dtype):
    """Grouped stride-1 SAME-ish conv via a factor-2 space-to-depth fold.

    ``out[t] = sum_j xp[t+j] @ W[j]`` (xp = x padded by k//2 each side, last
    output dropped — the HF even-k convention) is computed at half the
    sequence length: with ``x2[u] = (xp[2u], xp[2u+1])`` and ``j = 2v+q``,

      out[2u]   = sum_v  x2[u+v][0] W[2v]   + x2[u+v][1] W[2v+1]
      out[2u+1] = sum_v  x2[u+v][1] W[2v]   + x2[u+v+1][0] W[2v+1]

    i.e. ONE grouped conv over u with k/2+1 taps and doubled in/out channels
    per group (the odd phase rides the output-channel axis). FLOPs are equal
    (+1/(k/2+1) edge-tap zeros), but per-group channel dims double — 64-channel
    groups (XLS-R: C=1024, g=16) go from quarter-utilised MXU tiles to full
    128-lane tiles. Pure XLA, so the backward inherits the same tiling.
    """
    B, T, C = x.shape
    K, cpg, _ = kernel.shape
    g = groups
    opg = C // g
    V = K // 2  # folded tap count is V+1
    assert K % 2 == 0 and C == g * cpg

    te = T + (T % 2)  # fold needs an even length; trailing zero sliced away
    xp = jnp.pad(x.astype(dtype), ((0, 0), (K // 2, K // 2 + te - T), (0, 0)))
    # (B, U2, 2, g, cpg) -> (B, U2, g, 2, cpg): group-major channels so each
    # grouped-conv block sees both phases of its own 64 channels.
    x2 = xp.reshape(B, (te + K) // 2, 2, g, cpg).transpose(0, 1, 3, 2, 4)
    x2 = x2.reshape(B, (te + K) // 2, 2 * C)

    # Reshuffle W (K, cpg, C) -> W2 (V+1, 2*cpg, 2*C); in-channels (q, a),
    # out-channels (g, phase, b). Zero edge taps at v=V (phase 0 / q=1) and
    # v=0 (phase 1 / q=0).
    w = kernel.astype(dtype).reshape(V, 2, cpg, g, opg)  # (v, q, a, g, b)
    zero = jnp.zeros((1,) + w.shape[2:], dtype)
    p0 = jnp.concatenate([w, jnp.zeros((1,) + w.shape[1:], dtype)], axis=0)
    p1 = jnp.stack(
        [jnp.concatenate([zero, w[:, 1]], axis=0),   # q=0 reads W[2v-1]
         jnp.concatenate([w[:, 0], zero], axis=0)],  # q=1 reads W[2v]
        axis=1,
    )
    w2 = jnp.stack([p0, p1], axis=4)  # (v, q, a, g, phase, b)
    w2 = w2.reshape(V + 1, 2 * cpg, 2 * C)

    out2 = jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g,
    )  # (B, te//2, 2C) with channels (g, phase, b)
    out = out2.reshape(B, te // 2, g, 2, opg).transpose(0, 1, 3, 2, 4)
    out = out.reshape(B, te, C)[:, :T]
    return out + bias.astype(dtype)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (weight norm folded into the kernel)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        kernel = self.param(
            "conv_kernel", nn.initializers.he_normal(),
            (k, cfg.hidden_size // cfg.num_conv_pos_embedding_groups,
             cfg.hidden_size),
            jnp.float32,
        )
        bias = self.param("conv_bias", nn.initializers.zeros, (cfg.hidden_size,),
                          jnp.float32)
        if cfg.pos_conv_fold and k % 2 == 0:
            return jax.nn.gelu(_pos_conv_folded(
                x, kernel, bias, cfg.num_conv_pos_embedding_groups, cfg.dtype,
            ), approximate=False)
        # HF pads k//2 on both sides then drops the last frame when k is even.
        out = _conv1d(
            x, kernel, bias, stride=1, padding=[(k // 2, k // 2)],
            groups=cfg.num_conv_pos_embedding_groups, dtype=cfg.dtype,
        )
        if k % 2 == 0:
            out = out[:, :-1, :]
        return jax.nn.gelu(out, approximate=False)


def _flash_attention(q, k, v, pad_mask, head_dim: int):
    """Pallas TPU flash attention with padding handled via segment ids.

    Inputs are (B, T, H, d); the kernel wants (B, H, T, d) with T padded to the
    block size. Padding tokens get segment id 0 (valid = 1), so queries never
    attend across the boundary; padded outputs are sliced away.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, T, H, d = q.shape
    block = 128
    Tp = -(-T // block) * block
    pad = Tp - T

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # (B, H, T, d)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    ids = jnp.pad(pad_mask.astype(jnp.int32), ((0, 0), (0, pad)))
    sizes = BlockSizes(
        block_q=min(block, Tp), block_k_major=min(block, Tp),
        block_k=min(block, Tp), block_b=1,
        block_q_major_dkv=min(block, Tp), block_k_major_dkv=min(block, Tp),
        block_k_dkv=min(block, Tp), block_q_dkv=min(block, Tp),
        block_k_major_dq=min(block, Tp), block_k_dq=min(block, Tp),
        block_q_dq=min(block, Tp),
    )
    out = flash_attention(
        prep(q), prep(k), prep(v),
        segment_ids=SegmentIds(q=ids, kv=ids),
        causal=False,
        sm_scale=float(head_dim) ** -0.5,
        block_sizes=sizes,
    )
    return jnp.transpose(out[:, :, :T, :], (0, 2, 1, 3))


class Attention(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True, ln=None):
        cfg = self.config
        B, T, D = x.shape
        H = cfg.num_attention_heads
        head_dim = D // H

        def proj(name):
            return nn.Dense(D, dtype=cfg.dtype, name=name)

        if ln is not None and cfg.attention_fused_qkv_bias:
            raise ValueError(
                "attention_fused_qkv_bias is mutually exclusive with "
                "fused_qkv_ln (the LN fold already owns the q/k/v biases)"
            )
        if ln is not None:
            # Pre-attention LN folded into one packed (D, 3D) QKV projection
            # kernel (fused_qkv_ln). Parameters keep the nn.Dense tree paths;
            # the per-projection checkpoint names land on the lane slices.
            from ..ops.ffn_pallas import ln_dense

            wq, bq = _DenseParams(D, D, name="q_proj")()
            wk, bk = _DenseParams(D, D, name="k_proj")()
            wv, bv = _DenseParams(D, D, name="v_proj")()
            gamma, beta = ln
            qkv = ln_dense(
                x, jnp.concatenate([wq, wk, wv], axis=1),
                jnp.concatenate([bq, bk, bv]), gamma, beta,
                eps=cfg.layer_norm_eps,
            )
            q = checkpoint_name(qkv[:, :, :D], "q")
            k = checkpoint_name(qkv[:, :, D:2 * D], "k")
            v = checkpoint_name(qkv[:, :, 2 * D:], "v")
            qkv_bias = None
        elif cfg.attention_fused_qkv_bias:
            if cfg.attention_impl != "pallas" or (
                cfg.attention_save_stats != "v3"
            ):
                # Fail loudly: falling through to the unfused path would
                # silently measure the wrong thing (the round-3 advisor's
                # silent-config-no-op trap class).
                raise ValueError(
                    "attention_fused_qkv_bias requires "
                    "attention_impl='pallas' and attention_save_stats='v3' "
                    f"(got {cfg.attention_impl!r} / "
                    f"{cfg.attention_save_stats!r})"
                )
            # Bias-free projections; the (D,) biases apply inside the
            # attention kernel, whose backward emits dbq/dbk/dbv as
            # in-register row sums (XLA otherwise re-reads the 3 (B, T, D)
            # cotangents from HBM at ~0.2 ms/layer just for the bias
            # grads). Values are bit-identical to the Dense bias add; the
            # "q"/"k"/"v" checkpoint names land on the PRE-bias values the
            # backward kernel actually consumes. Parameters keep the
            # nn.Dense tree paths.
            mm = lambda w: jax.lax.dot_general(  # noqa: E731
                x, w.astype(cfg.dtype), (((2,), (0,)), ((), ())),
            )
            wq, bq = _DenseParams(D, D, name="q_proj")()
            wk, bk = _DenseParams(D, D, name="k_proj")()
            wv, bv = _DenseParams(D, D, name="v_proj")()
            q = checkpoint_name(mm(wq), "q")
            k = checkpoint_name(mm(wk), "k")
            v = checkpoint_name(mm(wv), "v")
            qkv_bias = (bq, bk, bv)
        else:
            q = checkpoint_name(proj("q_proj")(x), "q")
            k = checkpoint_name(proj("k_proj")(x), "k")
            v = checkpoint_name(proj("v_proj")(x), "v")
            qkv_bias = None

        if cfg.attention_impl == "pallas":
            from ..ops.attention_pallas import short_t_attention_flat

            # Flat (B, T, D) end to end: the kernel reads lane slices of the
            # projection outputs directly, and the flat output IS the
            # "attn_ctx" checkpoint AND the kernel's o residual (flash-style
            # delta backward) — no reshapes, no extra forward replay. The
            # o_residual path names "attn_ctx" itself (the name must land on
            # the residual var); the other paths are named below.
            out = short_t_attention_flat(
                q, k, v, pad_mask, head_dim,
                save_stats=cfg.attention_save_stats,
                o_residual=cfg.attention_o_residual,
                qkv_bias=qkv_bias,
            )
            named_inside = (
                # o_residual names "attn_ctx" on the residual var itself;
                # the v3 stats path names BOTH o and lse inside (renaming
                # here would double-save o under named policies).
                (cfg.attention_o_residual and not cfg.attention_save_stats)
                or cfg.attention_save_stats == "v3"
            )
            if not named_inside:
                out = checkpoint_name(out, "attn_ctx")
            out = proj("out_proj")(out)
            out = nn.Dropout(cfg.hidden_dropout)(
                out, deterministic=deterministic
            )
            return out
        else:
            q4 = q.reshape(B, T, H, head_dim)
            k4 = k.reshape(B, T, H, head_dim)
            v4 = v.reshape(B, T, H, head_dim)
            if cfg.attention_impl == "flash":
                out = _flash_attention(q4, k4, v4, pad_mask, head_dim)
            else:
                # (B, T) padding mask -> additive bias over heads/queries
                bias = jnp.where(
                    pad_mask[:, None, None, :], 0.0, -1e30
                ).astype(cfg.dtype)
                out = jax.nn.dot_product_attention(q4, k4, v4, bias=bias)
            out = out.reshape(B, T, D)
        out = checkpoint_name(out, "attn_ctx")
        out = proj("out_proj")(out)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        return out


class _DenseParams(nn.Module):
    """Bare Dense parameters on the same tree path as ``nn.Dense`` (the
    matmul itself runs inside a fused Pallas kernel)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class FeedForward(nn.Module):
    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None):
        cfg = self.config
        if cfg.fused_ffn and cfg.fused_ffn_block:
            # One differentiable block for the whole FFN: the backward kernel
            # recomputes h AND emits g on-MXU, so no value from this forward
            # is ever a VJP residual — the remat replay DCEs the FFN
            # (ops/ffn_pallas.py ffn_ln_block).
            from ..ops.ffn_pallas import ffn_block, ffn_ln_block

            kernel1, bias1 = _DenseParams(
                x.shape[-1], cfg.intermediate_size, name="intermediate_dense"
            )()
            kernel2, bias2 = _DenseParams(
                cfg.intermediate_size, cfg.hidden_size, name="output_dense"
            )()
            rate = cfg.activation_dropout if not deterministic else 0.0
            rng = self.make_rng("dropout") if rate > 0.0 else None
            if ln is not None:
                gamma, beta = ln
                x = ffn_ln_block(
                    x, kernel1, bias1, gamma, beta, kernel2, bias2, rate,
                    rng, eps=cfg.layer_norm_eps,
                    dw_in_kernel=cfg.fused_ffn_block_dw,
                    fc2_in_kernel=cfg.fused_ffn_block_fc2,
                    dg_in_kernel=cfg.fused_ffn_block_dg,
                )
            else:
                x = ffn_block(x, kernel1, bias1, kernel2, bias2, rate, rng)
            x = nn.Dropout(cfg.hidden_dropout)(
                x, deterministic=deterministic
            )
            return x
        if cfg.fused_ffn:
            # Matmul + bias + GELU (+ dropout) in one kernel: the (B, T, 4F)
            # pre-activation exists only as VMEM blocks (ops/ffn_pallas.py).
            # Parameters keep the nn.Dense tree path. When the caller hands
            # in the pre-FFN LayerNorm params (``ln``), the normalisation is
            # folded into the same kernel (fused_ffn_ln).
            from ..ops.ffn_pallas import ffn_fc1, ffn_ln_fc1

            kernel, bias = _DenseParams(
                x.shape[-1], cfg.intermediate_size, name="intermediate_dense"
            )()
            rate = cfg.activation_dropout if not deterministic else 0.0
            rng = self.make_rng("dropout") if rate > 0.0 else None
            if ln is not None:
                gamma, beta = ln
                x = ffn_ln_fc1(
                    x, kernel, bias, gamma, beta, rate, rng,
                    eps=cfg.layer_norm_eps,
                )
            else:
                x = ffn_fc1(x, kernel, bias, rate, rng)
            x = checkpoint_name(x, "ffn_act")
        else:
            x = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                         name="intermediate_dense")(x)
            x = checkpoint_name(x, "ffn_hidden")
            if cfg.activation_dropout > 0.0 and not deterministic:
                # Fused Pallas GELU+dropout: one pass each way, mask bits
                # generated in VMEM, backward re-seeds the same stream and
                # recomputes gelu' in-kernel — no rng buffers or duplicate
                # 131 MB activation tensors in HBM (ops/gelu_dropout_pallas.py).
                from ..ops.gelu_dropout_pallas import gelu_dropout

                x = gelu_dropout(
                    x, cfg.activation_dropout, self.make_rng("dropout")
                )
            else:
                x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output_dense")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return x


class EncoderLayer(nn.Module):
    """Transformer layer; pre-LN when do_stable_layer_norm (XLS-R), else post-LN.

    Returns ``(x, None)`` — the carry/output pair expected by ``nn.scan``.
    """

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        cfg = self.config
        if cfg.encoder_ln_impl == "pallas":
            # Same tree path/param names as nn.LayerNorm; the normalisation
            # runs in the one-pass ln_fused kernel.
            def ln(name):
                def apply(x):
                    from ..ops.ln_gelu_pallas import ln_fused

                    gamma, beta = _LayerNormParams(
                        cfg.hidden_size, name=name
                    )()
                    return ln_fused(
                        x, gamma, beta, eps=cfg.layer_norm_eps
                    ).astype(cfg.dtype)
                return apply
        else:
            ln = lambda name: nn.LayerNorm(  # noqa: E731
                epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name
            )
        if cfg.do_stable_layer_norm:
            # encoder_ln_impl keeps the LN A/B one config away: round 2
            # measured pallas slightly slower (760 vs 764 — XLA fused the LN
            # bwd with the residual adds), round 3 slightly faster (776 vs
            # 778) after the other kernels reshaped the fusion landscape.
            if cfg.fused_qkv_ln:
                # LN folded into the packed QKV projection kernel; "attn_in"
                # then names the pre-LN residual stream (= the kernel's VJP
                # residual), like "ffn_in" under fused_ffn_ln.
                gamma_beta = _LayerNormParams(
                    cfg.hidden_size, name="layer_norm"
                )()
                x = x + Attention(cfg, name="attention")(
                    checkpoint_name(x, "attn_in"), pad_mask, deterministic,
                    ln=gamma_beta,
                )
            else:
                x = x + Attention(cfg, name="attention")(
                    checkpoint_name(ln("layer_norm")(x), "attn_in"),
                    pad_mask, deterministic,
                )
            if cfg.fused_ffn and cfg.fused_ffn_ln:
                # LN folded into the fused FFN kernel; "ffn_in" then names
                # the pre-LN residual stream (= the kernel's VJP residual).
                gamma_beta = _LayerNormParams(
                    cfg.hidden_size, name="final_layer_norm"
                )()
                x = x + FeedForward(cfg, name="feed_forward")(
                    checkpoint_name(x, "ffn_in"), deterministic,
                    ln=gamma_beta,
                )
            else:
                x = x + FeedForward(cfg, name="feed_forward")(
                    checkpoint_name(ln("final_layer_norm")(x), "ffn_in"),
                    deterministic,
                )
        else:
            x = x + Attention(cfg, name="attention")(x, pad_mask, deterministic)
            x = ln("layer_norm")(x)
            x = x + FeedForward(cfg, name="feed_forward")(x, deterministic)
            x = ln("final_layer_norm")(x)
        return x, None


_REMAT_POLICIES = {
    # recompute everything (min memory, ~1 extra forward of compute)
    "nothing_saveable": jax.checkpoint_policies.nothing_saveable,
    # keep matmul outputs, recompute the cheap elementwise ops (good default)
    "dots_saveable": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    # Save exactly the *inputs* of the five big matmuls (per layer: the two LN
    # outputs, q/k/v, and the pre-out_proj context). Backward then recomputes
    # only the FFN up-projection + GELU and the (T, T) softmax chain — ~0.4 of
    # a forward instead of the full 1.0 — while storing ~197 MB/layer at
    # B=32 x 10 s vs dots_saveable's ~330 MB (it skips the 4x-wide ffn_hidden
    # and the batched attention dots).
    "save_matmul_inputs": jax.checkpoint_policies.save_only_these_names(
        "attn_in", "q", "k", "v", "attn_ctx", "ffn_in"
    ),
    # Save only the attention output (~49 MB/layer at B=48 x 10 s): the
    # backward replay recomputes LNs/projections/FFN but DCEs the attention
    # fwd kernel itself (its only consumer, out_proj, reads the saved value;
    # the bwd kernel's q/k/v residuals come from the replayed projections).
    # Pair with attention_save_stats=False — a live lse residual would pull
    # the fwd kernel back into the replay.
    "save_attn_ctx": jax.checkpoint_policies.save_only_these_names(
        "attn_ctx"
    ),
    # Save the two fused-kernel outputs whose replay is the expensive part of
    # the layer forward: the attention context (~49 MB/layer at B=48 x 10 s)
    # and the fused-FFN activation (~196 MB/layer). The backward replay then
    # DCEs both the attention fwd kernel and the FFN up-projection kernel,
    # recomputing only the LN/projection matmuls. PREREQUISITES: "ffn_act"
    # is only emitted on the fused-FFN path (the unfused path names
    # "ffn_hidden"), so without fused_ffn this silently degrades to
    # save_attn_ctx behaviour (model_setup warns); and like save_attn_ctx it
    # requires attention_save_stats=False (the stats variant's lse residual
    # is not policy-saved and would force a forward replay).
    "save_ctx_act": jax.checkpoint_policies.save_only_these_names(
        "attn_ctx", "ffn_act"
    ),
    # For attention_save_stats="v2": the stats backward reads lse (not o)
    # while out_proj's dW reads o, so saving both (~50 MB/layer total at
    # B=48 x 10 s) DCEs the attention forward from the remat replay AND
    # keeps the one-pass p = exp(s - lse) rebuild. With the stats variants
    # OFF this behaves exactly like save_attn_ctx (no "attn_lse" exists).
    "save_attn_ctx_lse": jax.checkpoint_policies.save_only_these_names(
        "attn_ctx", "attn_lse"
    ),
    # Also save the q/k/v projections (4 x ~49 MB/layer at B=48 x 10 s,
    # ~4.7 GB at 24 layers): the backward replay then carries only the LN
    # and out-projection matmuls — the attention bwd kernel's q/k/v
    # operands and the out-projection's dW operand all come from storage.
    # Memory-aggressive; pairs with fused_ffn_block (which freed the
    # 4x-wide stacking the old save_matmul_inputs_ffn paid).
    # ("attn_lse" only exists under attention_save_stats="v2"; naming it
    # here is harmless otherwise and keeps the policy composable with the
    # stats backward.)
    "save_qkv_ctx": jax.checkpoint_policies.save_only_these_names(
        "q", "k", "v", "attn_ctx", "attn_lse"
    ),
    # save_qkv_ctx OOMs at B=48 by 281 MB (16.02 vs 15.75 GB, round-4
    # probe); dropping v from the saved set fits — the replay then carries
    # only the LN + v/o projection matmuls.
    "save_qk_ctx": jax.checkpoint_policies.save_only_these_names(
        "q", "k", "attn_ctx", "attn_lse"
    ),
    # As above plus the 4x-wide FFN pre-activation ("ffn_hidden"; on the
    # fused-FFN path the post-activation "ffn_act" plays the same role):
    # backward recomputes only the softmax chain and elementwise ops.
    "save_matmul_inputs_ffn": jax.checkpoint_policies.save_only_these_names(
        "attn_in", "q", "k", "v", "attn_ctx", "ffn_in", "ffn_hidden",
        "ffn_act",
    ),
}


class Encoder(nn.Module):
    """Positional conv + scanned transformer stack (+ final LN for stable-LN)."""

    config: Wav2Vec2Config
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing_saveable"
    scan_unroll: int = 1

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        cfg = self.config
        # Zero padded positions BEFORE the positional conv so padding cannot smear
        # into valid frames through the conv window.
        x = x * pad_mask[..., None].astype(x.dtype)
        x = x + PositionalConvEmbedding(cfg, name="pos_conv_embed")(x)
        if not cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                             name="layer_norm")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        layer_cls = EncoderLayer
        if self.gradient_checkpointing:
            layer_cls = nn.remat(
                EncoderLayer, static_argnums=(3,),
                policy=_REMAT_POLICIES[self.remat_policy],
            )

        # One compiled layer body, (L, ...) stacked params. `unroll` trades
        # compile time for fewer while-loop iterations / DUS round-trips.
        ScannedLayers = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=cfg.num_hidden_layers,
            unroll=self.scan_unroll,
        )
        x, _ = ScannedLayers(cfg, name="layers")(x, pad_mask, deterministic)

        if cfg.do_stable_layer_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                             name="layer_norm")(x)
        return x


def _span_mask(
    rng: jax.Array, batch: int, length: int, mask_prob: float, span: int
) -> jnp.ndarray:
    """Sample a (B, length) boolean span mask with expected coverage ~= mask_prob.

    Bernoulli span *starts* with rate mask_prob/span, dilated to span width — the
    jit-friendly equivalent of HF's `_compute_mask_indices` (which draws an exact
    span count per row; expected coverage matches, per-row count varies slightly).
    """
    start_rate = mask_prob / span
    starts = jax.random.bernoulli(rng, start_rate, (batch, length))
    # Dilate: position t is masked if any start in (t-span, t]
    window = jnp.ones((span,), dtype=jnp.float32)
    dilated = jax.vmap(
        lambda row: jnp.convolve(row.astype(jnp.float32), window, mode="full")[
            : length
        ]
    )(starts)
    return dilated > 0


class Wav2Vec2Model(nn.Module):
    config: Wav2Vec2Config
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing_saveable"
    scan_unroll: int = 1
    # Remat the conv feature encoder saving only the raw conv outputs
    # ("conv_raw"): each conv's backward input is the previous block's saved
    # tensor, so the recompute is just the cheap LayerNorm + GELU — this frees
    # the duplicated ~2 GB of LN/GELU intermediates at B=32 x 10 s.
    remat_feature_encoder: bool = False

    def setup(self):
        cfg = self.config
        fe_cls = FeatureEncoder
        if self.remat_feature_encoder:
            fe_cls = nn.remat(
                FeatureEncoder,
                policy=jax.checkpoint_policies.save_only_these_names("conv_raw"),
            )
        self.feature_extractor = fe_cls(cfg, name="feature_extractor")
        self.feature_projection = FeatureProjection(cfg, name="feature_projection")
        self.encoder = Encoder(
            cfg, gradient_checkpointing=self.gradient_checkpointing,
            remat_policy=self.remat_policy, scan_unroll=self.scan_unroll,
            name="encoder"
        )
        if cfg.apply_spec_augment:
            self.masked_spec_embed = self.param(
                "masked_spec_embed", nn.initializers.uniform(scale=1.0),
                (cfg.hidden_size,), jnp.float32,
            )

    def __call__(
        self,
        input_values: jnp.ndarray,
        input_lengths: jnp.ndarray,
        deterministic: bool = True,
        freeze_feature_encoder: bool = False,
    ):
        """Run the encoder.

        Args:
            input_values: (B, T) z-normalised waveforms (zero-padded).
            input_lengths: (B,) valid sample counts.
            deterministic: Disables dropout and SpecAugment.
            freeze_feature_encoder: stop_gradient through the conv stack
                (reference: ``freeze_feature_encoder``, src/coral/wav2vec2.py:129).

        Returns:
            (hidden_states (B, T', D), frame_lengths (B,))
        """
        cfg = self.config
        feats = self.feature_extractor(input_values)
        if freeze_feature_encoder:
            feats = jax.lax.stop_gradient(feats)

        frame_lengths = cfg.feat_extract_output_lengths(input_lengths)
        T_out = feats.shape[1]
        pad_mask = jnp.arange(T_out)[None, :] < frame_lengths[:, None]  # (B, T')

        hidden = self.feature_projection(feats, deterministic=deterministic)

        if cfg.apply_spec_augment and not deterministic:
            B, T, D = hidden.shape
            time_rng = self.make_rng("spec_augment")
            feat_rng = self.make_rng("spec_augment")
            if cfg.mask_time_prob > 0:
                tmask = _span_mask(time_rng, B, T, cfg.mask_time_prob,
                                   cfg.mask_time_length)
                tmask = tmask & pad_mask
                hidden = jnp.where(
                    tmask[..., None],
                    self.masked_spec_embed.astype(hidden.dtype)[None, None, :],
                    hidden,
                )
            if cfg.mask_feature_prob > 0:
                fmask = _span_mask(feat_rng, B, D, cfg.mask_feature_prob,
                                   cfg.mask_feature_length)
                hidden = jnp.where(fmask[:, None, :], 0.0, hidden)

        hidden = self.encoder(hidden, pad_mask, deterministic=deterministic)
        return hidden, frame_lengths


class Wav2Vec2ForCTC(nn.Module):
    """wav2vec2 encoder + linear CTC head producing per-frame vocab logits."""

    config: Wav2Vec2Config
    gradient_checkpointing: bool = False
    remat_policy: str = "nothing_saveable"
    scan_unroll: int = 1
    remat_feature_encoder: bool = False

    def setup(self):
        cfg = self.config
        self.wav2vec2 = Wav2Vec2Model(
            cfg, gradient_checkpointing=self.gradient_checkpointing,
            remat_policy=self.remat_policy, scan_unroll=self.scan_unroll,
            remat_feature_encoder=self.remat_feature_encoder,
            name="wav2vec2"
        )
        self.lm_head = nn.Dense(cfg.vocab_size, dtype=cfg.dtype, name="lm_head")
        self.dropout = nn.Dropout(cfg.final_dropout)

    def __call__(
        self,
        input_values: jnp.ndarray,
        input_lengths: jnp.ndarray,
        deterministic: bool = True,
        freeze_feature_encoder: bool = False,
    ):
        hidden, frame_lengths = self.wav2vec2(
            input_values, input_lengths, deterministic=deterministic,
            freeze_feature_encoder=freeze_feature_encoder,
        )
        hidden = self.dropout(hidden, deterministic=deterministic)
        logits = self.lm_head(hidden)  # (B, T', V)
        return logits, frame_lengths
