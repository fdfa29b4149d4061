"""Decode-step attention kernels over flat (T, H*Dh) KV layouts (Pallas TPU).

Autoregressive whisper decoding reads the whole self-attention cache and the
cross-attention K/V every step. Two layout/structure sins make the naive
XLA formulation ~2x slower than the bandwidth floor:

- a (..., T, H, Dh) layout tiles the (12, 64) minor dims at (8, 128) and
  pads them 2.7x — every decode step streams 2.7x the bytes. These kernels
  keep K/V flat as (T, H*Dh) — which tiles at ~1.0x — and slice heads on
  the lane axis in VMEM (the trick validated by ``ops/attention_pallas.py``);
- scanning the decoder layers over stacked (L, ...) caches makes XLA
  materialise a per-layer slice before the attention op and stitch the
  update back afterwards (measured ~770 ms of a 1.9 s whisper-small beam
  decode). These kernels instead take the FULL stacked cache plus the layer
  index as a scalar-prefetch operand — the block index map reads the right
  layer slab directly out of HBM, no slice, no restitch.

Beam search folds its ancestor index chains into the same kernels: the score
mask ``onehot[b, k, j*T + t]`` selects, for query beam k, exactly the cache
slot j that holds its history at position t (and applies the causal bound
t <= pos). Attention scores are computed against ALL K slots — a K-fold
wider, still tiny, MXU contraction — so the cache is written once and never
reordered (see ``models/whisper.py`` ``beam_generate``).

Inference-only: no VJP. Off-TPU a vectorised jnp composition with identical
semantics runs instead (the Mosaic lowering is pinned against it on hardware
by ``tools/verify_kernels.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_VMEM_BUDGET = 10 * 1024 * 1024
# Batch rows per grid step. The round-5 batch-blocking experiment (multiple
# rows per step so cache DMAs approach streaming rate) REGRESSED end-to-end
# generate despite the higher per-DMA rates: whisper-small greedy 554.6 ms
# at BB=1 vs 676.6 at the 48 MB budget, beam-5 843.7 vs 1055.3 (hardware
# A/B, tools/r5h/i_runbook.sh) — coarser blocks serialize the pipeline's
# head/tail and the raised VMEM scope changes Mosaic's scheduling. One row
# per grid step is the measured winner; the budget stays env-tunable
# (CORAL_DECODE_BB_MB, MB of double-buffered k+v block set) for re-runs.
_DECODE_BB_BUDGET = int(
    float(os.environ.get("CORAL_DECODE_BB_MB", "0")) * 1024 * 1024
)
_COMPILER_PARAMS_BIG = pltpu.CompilerParams(
    vmem_limit_bytes=112 * 1024 * 1024
)


def _decode_compiler_params(block_set_bytes: int):
    """Raise the VMEM scope only when the double-buffered block set needs
    it: an unconditional 112 MB limit changes Mosaic's pipelining choices
    even for small block sets (measured as part of the round-5 decode
    batch-blocking regression)."""
    if block_set_bytes > 16 * 1024 * 1024:
        return _COMPILER_PARAMS_BIG
    return None


def _batch_block(B: int, slab_rows: int, HDg: int, itemsize: int) -> int:
    """Largest divisor of B whose double-buffered k+v block set fits the
    decode VMEM budget."""
    best = 1
    for bb in range(1, B + 1):
        if B % bb:
            continue
        if 4 * bb * slab_rows * HDg * itemsize <= _DECODE_BB_BUDGET:
            best = bb
    return best


def _head_groups(HD: int, head_dim: int, slab_rows: int, itemsize: int,
                 n_slabs: int) -> int:
    """Lane-group count so ``n_slabs`` double-buffered (slab_rows, HD/G)
    slabs stay inside scoped VMEM."""
    candidates = [
        g for g in range(1, HD // head_dim + 1)
        if HD % g == 0 and (HD // g) % head_dim == 0
    ]
    for g in candidates:
        if 2 * n_slabs * slab_rows * (HD // g) * itemsize <= _VMEM_BUDGET:
            return g
    return candidates[-1]


def _self_kernel(lidx_ref, q_ref, k_ref, v_ref, oh_ref, o_ref, *,
                 head_dim: int, scale: float):
    del lidx_ref  # consumed by the index maps
    _, BB, K, T, HDg = k_ref.shape
    for b in range(BB):
        kf = k_ref[0, b].reshape(K * T, HDg)
        vf = v_ref[0, b].reshape(K * T, HDg)
        q = q_ref[b]  # (K, HDg)
        oh = oh_ref[b]  # (K, K*T)
        for h in range(HDg // head_dim):
            lanes = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, lanes], kf[:, lanes], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (K, K*T)
            s = jnp.where(oh > 0, s, _NEG)
            p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot_general(
                p.astype(vf.dtype), vf[:, lanes], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, lanes] = o.astype(o_ref.dtype)


def _cross_kernel(lidx_ref, q_ref, k_ref, v_ref, o_ref, *, head_dim: int,
                  scale: float):
    del lidx_ref
    _, BB, _, HDg = k_ref.shape
    for b in range(BB):
        kf = k_ref[0, b]  # (S, HDg)
        vf = v_ref[0, b]
        q = q_ref[b]  # (K, HDg)
        for h in range(HDg // head_dim):
            lanes = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, lanes], kf[:, lanes], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (K, S)
            p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot_general(
                p.astype(vf.dtype), vf[:, lanes], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, lanes] = o.astype(o_ref.dtype)


def decode_self_attention(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    onehot: jnp.ndarray,
    n_heads: int,
    layer: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One-token self-attention over one layer of a stacked flat cache.

    Args:
        q: (B*K, HD) current-position queries.
        cache_k, cache_v: (L, B*K, T, HD) stacked caches; only ``layer`` is
            read — via a scalar-prefetch block index, so no (B*K, T, HD)
            slice is ever materialised.
        onehot: (B, K, K*T) 0/1 mask — query beam k of batch b may attend
            cache slot j at position t iff ``onehot[b, k, j*T + t] == 1``.
            Encodes both the ancestor chain and the causal bound. For K=1
            this is just the causal mask.
        n_heads: head count (HD = n_heads * head_dim).
        layer: scalar int32 layer index.

    Returns:
        (B*K, HD) attention outputs, dtype of ``q``.
    """
    L, BK, T, HD = cache_k.shape
    B, K, KT = onehot.shape
    assert BK == B * K and KT == K * T
    head_dim = HD // n_heads
    scale = head_dim ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        kl = jax.lax.dynamic_index_in_dim(cache_k, layer, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(cache_v, layer, 0, keepdims=False)
        qh = q.reshape(B, K, n_heads, head_dim)
        kh = kl.reshape(B, K, T, n_heads, head_dim)
        vh = vl.reshape(B, K, T, n_heads, head_dim)
        s = jnp.einsum(
            "bkhd,bjthd->bkhjt", qh, kh, preferred_element_type=jnp.float32
        ) * scale
        s = s.reshape(B, K, n_heads, K * T)
        s = jnp.where(onehot[:, :, None, :] > 0, s, _NEG)
        p = jax.nn.softmax(s, axis=-1).reshape(B, K, n_heads, K, T)
        o = jnp.einsum(
            "bkhjt,bjthd->bkhd", p.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        )
        return o.reshape(B * K, HD).astype(q.dtype)

    G = _head_groups(HD, head_dim, K * T, cache_k.dtype.itemsize, 2)
    BB = _batch_block(B, K * T, HD // G, cache_k.dtype.itemsize)
    # Leading-dim splits (free metadata reshapes) give blocks whose last two
    # dims equal the array dims — the Mosaic block-shape requirement for the
    # non-8-aligned K axis.
    q3 = q.reshape(B, K, HD)
    k5 = cache_k.reshape(L, B, K, T, HD)
    v5 = cache_v.reshape(L, B, K, T, HD)
    q_spec = pl.BlockSpec((BB, K, HD // G), lambda b, g, lref: (b, 0, g))
    kv_spec = pl.BlockSpec(
        (1, BB, K, T, HD // G), lambda b, g, lref: (lref[0], b, 0, 0, g)
    )
    oh_spec = pl.BlockSpec((BB, K, KT), lambda b, g, lref: (b, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BB, G),
        in_specs=[q_spec, kv_spec, kv_spec, oh_spec],
        out_specs=q_spec,
    )
    out = pl.pallas_call(
        functools.partial(_self_kernel, head_dim=head_dim, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        interpret=interpret,
        compiler_params=_decode_compiler_params(
            4 * BB * K * T * (HD // G) * cache_k.dtype.itemsize
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q3, k5, v5, onehot)
    return out.reshape(B * K, HD)


def decode_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    layer: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One-token cross-attention; the K beams of each batch item share K/V.

    Args:
        q: (B*K, HD) queries.
        k, v: (L, B, S, HD) stacked per-layer encoder K/V (NOT repeated per
            beam, NOT sliced per layer — the scalar-prefetch block index
            reads layer ``layer`` directly).
        n_heads: head count.
        layer: scalar int32 layer index.

    Returns:
        (B*K, HD) attention outputs.
    """
    L, B, S, HD = k.shape
    BK = q.shape[0]
    K = BK // B
    head_dim = HD // n_heads
    scale = head_dim ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        kl = jax.lax.dynamic_index_in_dim(k, layer, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
        qh = q.reshape(B, K, n_heads, head_dim)
        kh = kl.reshape(B, S, n_heads, head_dim)
        vh = vl.reshape(B, S, n_heads, head_dim)
        s = jnp.einsum(
            "bkhd,bshd->bkhs", qh, kh, preferred_element_type=jnp.float32
        ) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum(
            "bkhs,bshd->bkhd", p.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        )
        return o.reshape(B * K, HD).astype(q.dtype)

    G = _head_groups(HD, head_dim, S, k.dtype.itemsize, 2)
    BB = _batch_block(B, S, HD // G, k.dtype.itemsize)
    q3 = q.reshape(B, K, HD)
    q_spec = pl.BlockSpec((BB, K, HD // G), lambda b, g, lref: (b, 0, g))
    kv_spec = pl.BlockSpec(
        (1, BB, S, HD // G), lambda b, g, lref: (lref[0], b, 0, g)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BB, G),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
    )
    out = pl.pallas_call(
        functools.partial(_cross_kernel, head_dim=head_dim, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        interpret=interpret,
        compiler_params=_decode_compiler_params(
            4 * BB * S * (HD // G) * k.dtype.itemsize
        ),
    )(jnp.reshape(layer, (1,)).astype(jnp.int32), q3, k, v)
    return out.reshape(B * K, HD)
