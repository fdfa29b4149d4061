"""Decode-step attention kernels over flat (T, H*Dh) KV layouts (Pallas TPU).

Autoregressive whisper decoding reads the whole self-attention cache and the
cross-attention K/V every step. With the natural (..., T, H, Dh) layout the
TPU tiles the (H=12, Dh=64) minor dims at (8, 128) and pads them 2.7x — so
every decode step streams 2.7x the bytes (the decode loop is pure HBM
bandwidth). These kernels keep K/V flat as (T, H*Dh) — which tiles at ~1.0x —
and slice heads on the lane axis in VMEM (the trick validated by
``ops/attention_pallas.py``: lane slices of (T, H*d) lower fine where
head-dim slicing of (T, H, d) does not).

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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -1e30
_VMEM_BUDGET = 10 * 1024 * 1024


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


def _self_kernel(q_ref, k_ref, v_ref, oh_ref, o_ref, *, head_dim: int,
                 scale: float):
    _, K, T, HDg = k_ref.shape
    kf = k_ref[0].reshape(K * T, HDg)
    vf = v_ref[0].reshape(K * T, HDg)
    q = q_ref[0]  # (K, HDg)
    oh = oh_ref[0]  # (K, K*T)
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
        o_ref[0, :, lanes] = o.astype(o_ref.dtype)


def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim: int, scale: float):
    kf = k_ref[0]  # (S, HDg)
    vf = v_ref[0]
    q = q_ref[0]  # (K, HDg)
    for h in range(kf.shape[1] // head_dim):
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
        o_ref[0, :, lanes] = o.astype(o_ref.dtype)


def decode_self_attention(
    q: jnp.ndarray,
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    onehot: jnp.ndarray,
    n_heads: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One-token self-attention over a flat cache, with slot selection.

    Args:
        q: (B*K, HD) current-position queries.
        cache_k, cache_v: (B*K, T, HD) caches (valid entries wherever
            ``onehot`` admits them).
        onehot: (B, K, K*T) 0/1 mask — query beam k of batch b may attend
            cache slot j at position t iff ``onehot[b, k, j*T + t] == 1``.
            Encodes both the ancestor chain and the causal bound. For K=1
            this is just the causal mask.
        n_heads: head count (HD = n_heads * head_dim).

    Returns:
        (B*K, HD) attention outputs, dtype of ``q``.
    """
    BK, T, HD = cache_k.shape
    B, K, KT = onehot.shape
    assert BK == B * K and KT == K * T
    head_dim = HD // n_heads
    scale = head_dim ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        qh = q.reshape(B, K, n_heads, head_dim)
        kh = cache_k.reshape(B, K, T, n_heads, head_dim)
        vh = cache_v.reshape(B, K, T, n_heads, head_dim)
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
    grid = (B, G)
    # Leading-dim splits (free metadata reshapes) give blocks whose last two
    # dims equal the array dims — the Mosaic block-shape requirement for the
    # non-8-aligned K axis.
    q3 = q.reshape(B, K, HD)
    k4 = cache_k.reshape(B, K, T, HD)
    v4 = cache_v.reshape(B, K, T, HD)
    q_spec = pl.BlockSpec((1, K, HD // G), lambda b, g: (b, 0, g))
    kv_spec = pl.BlockSpec((1, K, T, HD // G), lambda b, g: (b, 0, 0, g))
    oh_spec = pl.BlockSpec((1, K, KT), lambda b, g: (b, 0, 0))
    out = pl.pallas_call(
        functools.partial(_self_kernel, head_dim=head_dim, scale=scale),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, oh_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        interpret=interpret,
    )(q3, k4, v4, onehot)
    return out.reshape(B * K, HD)


def decode_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One-token cross-attention; the K beams of each batch item share K/V.

    Args:
        q: (B*K, HD) queries.
        k, v: (B, S, HD) encoder K/V (NOT repeated per beam — the kernel
            broadcasts, so the 2.7x-padded (B*K, S, H, Dh) copy the naive
            layout needs never exists).
        n_heads: head count.

    Returns:
        (B*K, HD) attention outputs.
    """
    B, S, HD = k.shape
    BK = q.shape[0]
    K = BK // B
    head_dim = HD // n_heads
    scale = head_dim ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        qh = q.reshape(B, K, n_heads, head_dim)
        kh = k.reshape(B, S, n_heads, head_dim)
        vh = v.reshape(B, S, n_heads, head_dim)
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
    grid = (B, G)
    q3 = q.reshape(B, K, HD)
    q_spec = pl.BlockSpec((1, K, HD // G), lambda b, g: (b, 0, g))
    kv_spec = pl.BlockSpec((1, S, HD // G), lambda b, g: (b, 0, g))
    out = pl.pallas_call(
        functools.partial(_cross_kernel, head_dim=head_dim, scale=scale),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q3.shape, q.dtype),
        interpret=interpret,
    )(q3, k, v)
    return out.reshape(B * K, HD)
