"""Fused short-sequence attention kernel (Pallas TPU).

The wav2vec2 encoder runs bidirectional attention over ~500 frames (10 s of
audio after the 320x conv downsampling) with 16 heads of 64 dims — shapes where
a blocked flash kernel is overkill (one (T, T) score tile fits VMEM whole) but
XLA's unfused lowering is badly HBM-bound: it materialises the fp32
``(B, H, T, T)`` logits and softmax tensors (~0.5 GB each at B=32) in HBM for
the forward AND keeps them as backward residuals, so every train step moves
multiple GB per layer. The reference hits the same math through torch SDPA
(reference: HF ``Wav2Vec2ForCTC`` attention, configured at
``src/coral/wav2vec2.py:104-126``).

The kernel processes one batch row per grid step, iterating the heads inside
the program as lane slices of the flattened ``(B, T, H*d)`` operands — the
projection outputs' natural layout, so no transposes or XLA layout copies
surround the custom call (an earlier ``(B, H, T, d)`` variant cost ~22 ms/step
in copies at B=32). Per head the whole (T, T) score matrix lives in VMEM:

- forward: ``softmax(q k^T * scale + k_bias) v`` with fp32 softmax; nothing
  but ``o`` is written back to HBM;
- backward: recomputes scores/probabilities on-MXU from the saved q/k/v (the
  fp32 (T, T) tensors never touch HBM), then forms dv/dq/dk with five small
  matmuls per head.

Padding is handled k-side via an additive ``(B, T)`` bias (``0`` valid,
``-inf`` padded), matching the XLA path in ``models/wav2vec2.py`` exactly.
Intended for T up to ~1024; above that a blocked flash kernel wins.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

# One-ahead software pipelining of the per-head loops in the stats kernels:
# head h+1's score matmul (MXU) is issued before head h's softmax/ds phase
# (VPU), giving Mosaic's scheduler adjacent independent MXU and VPU work.
# 0 = the sequential round-3 ordering.
_ATTN_PIPE = int(os.environ.get("CORAL_ATTN_PIPE", "0"))


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale: float,
                head_dim: int):
    bias = bias_ref[0]  # (1, T), broadcasts over query rows
    n_heads = q_ref.shape[2] // head_dim
    for h in range(n_heads):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        # Fold the score scale into q: a (T, d) pass instead of (T, T).
        q = q_ref[0, :, lanes] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, :, lanes]
        v = v_ref[0, :, lanes]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        # o = (e @ v) / l: the 1/l row scaling moves to the (T, d) output,
        # saving the (T, T) divide pass the VPU is the bottleneck for here.
        o = jax.lax.dot_general(
            e.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lanes] = (o / l).astype(o_ref.dtype)


def _fwd_kernel_stats(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                      sm_scale: float, head_dim: int):
    """Forward that also writes the per-query log-sum-exp (``m + log l``) so
    a stats-fed backward can rebuild ``p = exp(s - lse)`` in one pass,
    skipping the max/sum reductions and the divide. lse is laid out
    ``(B, H, T)`` — one f32 ROW per head, ~1 MB/layer at production shapes —
    because Mosaic requires output blocks whose last dim is 128-divisible or
    equal to the array dim: an ``(B, T, H)`` column layout would need an
    ``(1, T, H/groups)`` block (8 lanes), which fails to lower. To produce
    row-form stats without any in-kernel relayout, the whole kernel runs in
    transposed score space: ``sT = k qT`` is ``(Tk, Tq)``, so the bias is a
    k-side COLUMN (the wrapper passes it pre-transposed as ``(B, T, 1)``)
    and the max/sum reductions land on axis 0, yielding ``(1, Tq)`` rows
    directly. The price vs the stats-free forward is the ``(T, T)`` divide
    by ``l`` (row-form ``l`` cannot scale the ``(Tq, d)`` output without a
    relayout); the backward's saved passes are what the variant buys."""
    bias_c = bias_ref[0]  # (T, 1): additive k-side bias, column form
    n_heads = q_ref.shape[2] // head_dim
    lse_rows = []
    for h in range(n_heads):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, lanes] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, :, lanes]
        v = v_ref[0, :, lanes]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tk, Tq)
        st = st + bias_c
        m = jnp.max(st, axis=0, keepdims=True)   # (1, Tq)
        e = jnp.exp(st - m)
        l = jnp.sum(e, axis=0, keepdims=True)    # (1, Tq)
        p = e / l
        o = jax.lax.dot_general(
            p.astype(q.dtype), v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tq, d)
        o_ref[0, :, lanes] = o.astype(o_ref.dtype)
        # Clamp: a fully-masked row has m = -1e30, and the backward's
        # ``exp(s + bias - lse)`` would catastrophically cancel (both terms
        # round to -1e30 in f32, giving p = 1 instead of 1/T — T-times
        # inflated gradients). Clamping to -1e25 keeps the difference at
        # ~-1e30, so such rows get p = 0: zero gradients, strictly safer
        # than the plain path's uniform-garbage ones. Real rows always have
        # a finite max score, so the clamp never binds for them.
        lse_rows.append(jnp.maximum(m + jnp.log(l), -1e25))
    # One full-block (H_g, T) store.
    lse_ref[0] = jnp.concatenate(lse_rows, axis=0)


def _fwd_kernel_stats_v2(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                         sm_scale: float, head_dim: int):
    """Stats forward in NORMAL score space: identical compute to the
    adopted stats-free forward (scale folded into q, the 1/l scaling on the
    (T, d) output — no (T, T) divide), plus one small in-register
    ``(T, 1) -> (1, T)`` transpose per head to emit the log-sum-exp in the
    row layout Mosaic's output-block rule demands. The round-3 stats
    variant ran the whole forward in transposed score space to avoid that
    transpose and paid a (T, T) divide for it (measured slower, PARITY.md);
    here the transpose touches T floats per head instead."""
    bias = bias_ref[0]  # (1, T), broadcasts over query rows
    n_heads = q_ref.shape[2] // head_dim
    lse_rows = []

    def _load(h):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, lanes] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, :, lanes]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return lanes, q, s

    cur = _load(0) if _ATTN_PIPE else None
    for h in range(n_heads):
        if _ATTN_PIPE:
            # One-ahead pipeline (see _ATTN_PIPE): the next head's score
            # matmul is independent of this head's softmax phase.
            nxt = _load(h + 1) if h + 1 < n_heads else None
            lanes, q, s = cur
        else:
            lanes, q, s = _load(h)
        v = v_ref[0, :, lanes]
        s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)   # (T, 1)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)   # (T, 1)
        o = jax.lax.dot_general(
            e.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lanes] = (o / l).astype(o_ref.dtype)
        # Clamp like the v1 stats forward (see _fwd_kernel_stats): a fully
        # masked row must yield p = 0 in the backward, not p = 1.
        lse_col = jnp.maximum(m + jnp.log(l), -1e25)  # (T, 1)
        lse_rows.append(lse_col.reshape(1, -1))       # (1, T) relayout
        if _ATTN_PIPE:
            cur = nxt
    lse_ref[0] = jnp.concatenate(lse_rows, axis=0)


def _bwd_kernel_stats(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, *, sm_scale: float,
                      head_dim: int):
    """Backward fed the forward's log-sum-exp: the (T, T) probability matrix
    is rebuilt as ``exp(s - lse)`` — one fused subtract+exp pass instead of
    the max reduction, exp, sum reduction, and divide of the stats-free
    recompute. Like the stats forward it runs in transposed score space so
    the ``(1, Tq)`` lse rows and the ``(Tk, 1)`` bias column both broadcast
    without relayouts; every product is a plain ``dot_general`` with the
    contraction dims swapped accordingly."""
    bias_c = bias_ref[0]  # (T, 1)
    n_heads = q_ref.shape[2] // head_dim

    def _load(h):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, lanes] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, :, lanes]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tk, Tq)
        return lanes, q, k, st

    cur = _load(0) if _ATTN_PIPE else None
    for h in range(n_heads):
        if _ATTN_PIPE:
            # One-ahead pipeline: the NEXT head's score matmul is emitted
            # before this head's VPU phase (independent work for dual-issue).
            nxt = _load(h + 1) if h + 1 < n_heads else None
            lanes, q, k, st = cur
        else:
            lanes, q, k, st = _load(h)
        v = v_ref[0, :, lanes]
        do = do_ref[0, :, lanes]
        lse = lse_ref[0, h:h + 1, :]  # (1, Tq) row

        p = jnp.exp(st + bias_c - lse)

        pb = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, d)
        dp = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, Tq)
        delta = jnp.sum(p * dp, axis=0, keepdims=True)  # (1, Tq)
        ds = (p * (dp - delta)).astype(q.dtype)  # (Tk, Tq)
        dq = jax.lax.dot_general(
            ds, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (Tq, d)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, d); sm_scale arrives via the pre-scaled q
        dq_ref[0, :, lanes] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, lanes] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, lanes] = dv.astype(dv_ref.dtype)
        if _ATTN_PIPE:
            cur = nxt


def _fwd_kernel_stats_v2_qb(q_ref, k_ref, v_ref, bq_ref, bk_ref, bv_ref,
                            bias_ref, o_ref, lse_ref, *, sm_scale: float,
                            head_dim: int):
    """v2 stats forward with the q/k/v PROJECTION biases applied in-kernel
    (``attention_fused_qkv_bias``): the model's projections run bias-free
    and the (HD,) biases ride in as vectors, so the backward can emit the
    bias gradients as in-register row sums instead of XLA re-reading the
    3 x (B, T, D) cotangents from HBM (3 x ~0.067 ms/layer at B=48 x 10 s,
    measured at HBM peak — unimprovable outside the kernel). Numerics are
    identical to the Dense bias add (bf16 q + bf16 bias, scale applied
    after)."""
    bias = bias_ref[0]  # (1, T), broadcasts over query rows
    n_heads = q_ref.shape[2] // head_dim
    lse_rows = []
    for h in range(n_heads):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0, :, lanes] + bq_ref[0, lanes]) * jnp.asarray(
            sm_scale, q_ref.dtype
        )
        k = k_ref[0, :, lanes] + bk_ref[0, lanes]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        v = v_ref[0, :, lanes] + bv_ref[0, lanes]
        s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)   # (T, 1)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)   # (T, 1)
        o = jax.lax.dot_general(
            e.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, lanes] = (o / l).astype(o_ref.dtype)
        # Same fully-masked-row clamp as the other stats forwards.
        lse_col = jnp.maximum(m + jnp.log(l), -1e25)  # (T, 1)
        lse_rows.append(lse_col.reshape(1, -1))       # (1, T) relayout
    lse_ref[0] = jnp.concatenate(lse_rows, axis=0)


def _bwd_kernel_stats_ctx_qb(q_ref, k_ref, v_ref, bq_ref, bk_ref, bv_ref,
                             bias_ref, do_ref, lse_ref, o_ref,
                             dq_ref, dk_ref, dv_ref, dbv_ref, *,
                             sm_scale: float, head_dim: int):
    """v3 stats backward with in-kernel projection biases: identical math to
    ``_bwd_kernel_stats_ctx`` on (q+bq, k+bk, v+bv), plus per-batch-row
    bias-gradient partials. dq/dk/dv are unchanged by the bias adds (the
    add's VJP is identity), and dbq/dbk are plain row sums of dq/dk that
    the CALLER computes from this kernel's dq/dk outputs... except those
    XLA reduces are exactly what this variant exists to avoid — so all
    three are emitted here as one (1, 3, HDg) block of row-sums per batch
    row."""
    bias_c = bias_ref[0]  # (T, 1)
    n_heads = q_ref.shape[2] // head_dim
    for h in range(n_heads):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        q = (q_ref[0, :, lanes] + bq_ref[0, lanes]) * jnp.asarray(
            sm_scale, q_ref.dtype
        )
        k = k_ref[0, :, lanes] + bk_ref[0, lanes]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tk, Tq)
        v = v_ref[0, :, lanes] + bv_ref[0, lanes]
        do = do_ref[0, :, lanes]
        o = o_ref[0, :, lanes]
        lse = lse_ref[0, h:h + 1, :]  # (1, Tq) row

        p = jnp.exp(st + bias_c - lse)
        delta_col = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=1, keepdims=True,
        )  # (Tq, 1)
        delta = delta_col.reshape(1, -1)  # (1, Tq) row

        pb = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, d)
        dp = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, Tq)
        ds = (p * (dp - delta)).astype(q.dtype)  # (Tk, Tq)
        dq = jax.lax.dot_general(
            ds, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (Tq, d)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, d)
        dqb = dq.astype(dq_ref.dtype)
        dkb = dk.astype(dk_ref.dtype)
        dvb = dv.astype(dv_ref.dtype)
        dq_ref[0, :, lanes] = dqb
        dk_ref[0, :, lanes] = dkb
        dv_ref[0, :, lanes] = dvb
        # Bias-grad partials: row sums of the (bf16-rounded, exactly what
        # XLA's reduce would consume) cotangents, f32 accumulation.
        dbv_ref[0, 0:1, lanes] = jnp.sum(
            dqb.astype(jnp.float32), axis=0, keepdims=True
        )
        dbv_ref[0, 1:2, lanes] = jnp.sum(
            dkb.astype(jnp.float32), axis=0, keepdims=True
        )
        dbv_ref[0, 2:3, lanes] = jnp.sum(
            dvb.astype(jnp.float32), axis=0, keepdims=True
        )


def _bwd_kernel_stats_ctx(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                          o_ref, dq_ref, dk_ref, dv_ref, *, sm_scale: float,
                          head_dim: int):
    """Backward fed BOTH forward residuals (the v3 variant): the (T, T)
    probability matrix is rebuilt as ``exp(s - lse)`` (one fused pass, like
    the v1/v2 stats backward) AND the softmax-grad correction comes from the
    flash identity ``delta = rowsum(do * o)`` — a (T, d) multiply +
    lane-reduce instead of the (T, T) ``sum(p * dp)`` multiply + reduction
    the stats backward pays. Both residuals are policy-saved under
    save_qk_ctx / save_attn_ctx_lse (o IS "attn_ctx", lse IS "attn_lse"),
    so the variant costs no extra HBM over v2."""
    bias_c = bias_ref[0]  # (T, 1)
    n_heads = q_ref.shape[2] // head_dim
    for h in range(n_heads):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, lanes] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, :, lanes]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tk, Tq)
        v = v_ref[0, :, lanes]
        do = do_ref[0, :, lanes]
        o = o_ref[0, :, lanes]
        lse = lse_ref[0, h:h + 1, :]  # (1, Tq) row

        p = jnp.exp(st + bias_c - lse)

        # delta = sum_k p * dp = do . o per query row (flash identity): a
        # (T, d) pass + the same T-float in-register relayout the v2 stats
        # forward uses for lse.
        delta_col = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=1, keepdims=True,
        )  # (Tq, 1)
        delta = delta_col.reshape(1, -1)  # (1, Tq) row

        pb = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, d)
        dp = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, Tq)
        ds = (p * (dp - delta)).astype(q.dtype)  # (Tk, Tq)
        dq = jax.lax.dot_general(
            ds, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (Tq, d)
        dk = jax.lax.dot_general(
            ds, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tk, d); sm_scale arrives via the pre-scaled q
        dq_ref[0, :, lanes] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, lanes] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, lanes] = dv.astype(dv_ref.dtype)


def _bwd_kernel_ctx(q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                    dq_ref, dk_ref, dv_ref, *, sm_scale: float,
                    head_dim: int):
    """Backward fed the forward's OUTPUT ``o`` as a residual: the softmax
    delta becomes the flash-style (T, d) row sum ``delta = rowsum(do * o)``
    (identical math: sum_j p_ij dp_ij = sum_d do_id (p v)_id), replacing the
    recompute path's (T, T) ``p * dp`` multiply + row reduction. The round-3
    attempt at this was reverted because the o residual was a pre-reshape
    value the remat policies couldn't match; the flat (B, T, H*d) layout
    (== the model's (B, T, D) ``attn_ctx``) removes the reshape entirely, so
    the saved/replayed ``attn_ctx`` IS the residual."""
    bias = bias_ref[0]
    n_heads = q_ref.shape[2] // head_dim
    for h in range(n_heads):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, :, lanes] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, :, lanes]
        v = v_ref[0, :, lanes]
        do = do_ref[0, :, lanes]
        o = o_ref[0, :, lanes]

        # delta first: a (T, d) pass, fp32.
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=1, keepdims=True,
        )

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        p = e / l

        pb = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, lanes] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, lanes] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, lanes] = dv.astype(dv_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, sm_scale: float, head_dim: int):
    # NOTE (round 3): two "obvious" rewrites measured SLOWER end-to-end and
    # were reverted — (a) flash-style delta = rowsum(do * o) off the saved
    # output: the o residual is a pre-reshape value the named-checkpoint remat
    # policies don't recognise as the saved "attn_ctx", so the fwd kernel
    # replayed inside the backward (771.6 -> 749 audio-s/s under
    # save_matmul_inputs); (b) folding the 1/l normalisation into (T, d) row
    # scalings: Mosaic already register-fuses the elementwise chains, so it
    # saved no VMEM passes and the extra operand pressure cost ~5 ms/step.
    bias = bias_ref[0]
    n_heads = q_ref.shape[2] // head_dim
    for h in range(n_heads):
        lanes = slice(h * head_dim, (h + 1) * head_dim)
        # Fold the score scale into q (a (T, d) pass) like the forward: the
        # unscaled (T, T) ``s * sm_scale`` multiply disappears, and the scale
        # re-enters dq/dk through (T, d)-sized epilogues. For the production
        # d = 64 the scale is a power of two, so bf16 rounding is unchanged.
        q = q_ref[0, :, lanes] * jnp.asarray(sm_scale, q_ref.dtype)
        k = k_ref[0, :, lanes]
        v = v_ref[0, :, lanes]
        do = do_ref[0, :, lanes]

        # Recompute probabilities (fp32, VMEM-resident).
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s + bias
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        p = e / l

        pb = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(p * dp, axis=1, keepdims=True)
        # ds carries no sm_scale: dq picks it up in a (T, d) epilogue, and dk
        # gets it for free by contracting against the already-scaled q.
        ds = (p * (dp - delta)).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, lanes] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, lanes] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, lanes] = dv.astype(dv_ref.dtype)


_VMEM_BUDGET = 10 * 1024 * 1024  # scoped VMEM is 16 MB; leave headroom


def _head_groups(
    HD: int, head_dim: int, n_blocks: int, T: int, itemsize: int
) -> int:
    """Split the flattened head axis into head-aligned lane groups so that
    ``n_blocks`` double-buffered (T, HD/groups) slabs stay inside scoped
    VMEM. Starts from the measured-good ~512-lane heuristic and grows the
    group count until the budget holds, so longer sequences or wider heads
    can't silently overflow. The save_stats variants add one (H/groups, T)
    f32 lse block on top (~head_dim x smaller than a slab, ~0.5% of the
    budget at production shapes) — deliberately not counted here so both
    variants pick identical groupings."""
    candidates = [
        g for g in range(1, HD // head_dim + 1)
        if HD % g == 0 and (HD // g) % head_dim == 0
    ]
    start = max(1, HD // 512)
    for g in candidates:
        fits = 2 * n_blocks * T * (HD // g) * itemsize <= _VMEM_BUDGET
        if g >= start and fits:
            return g
    return candidates[-1]


def _specs(T, HD, groups):
    # Arrays are (B, T, H*d); one (T, H*d/groups) lane slab per grid step.
    qkv = pl.BlockSpec((1, T, HD // groups), lambda b, g: (b, 0, g))
    # bias is (B, 1, T): trailing block dims equal the array dims.
    bias = pl.BlockSpec((1, 1, T), lambda b, g: (b, 0, 0))
    return qkv, bias


def _fwd_pallas(q, k, v, bias, sm_scale, head_dim, interpret):
    B, T, HD = q.shape
    groups = _head_groups(
        HD, head_dim, n_blocks=5, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, bias_spec = _specs(T, HD, groups)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, head_dim=head_dim),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _bwd_pallas(q, k, v, bias, do, sm_scale, head_dim, interpret):
    B, T, HD = q.shape
    groups = _head_groups(
        HD, head_dim, n_blocks=8, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, bias_spec = _specs(T, HD, groups)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, head_dim=head_dim),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, bias, do)


def _bwd_ctx_pallas(q, k, v, bias, do, o, sm_scale, head_dim, interpret):
    B, T, HD = q.shape
    groups = _head_groups(
        HD, head_dim, n_blocks=9, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, bias_spec = _specs(T, HD, groups)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_ctx, sm_scale=sm_scale, head_dim=head_dim
        ),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec,
                  qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, bias, do, o)


def _lse_spec(T, H, groups):
    # lse is (B, H, T): one f32 ROW per head, head-grouped like q/k/v's lane
    # groups. Row layout is forced by Mosaic's output-block rule (last dim
    # must be 128-divisible or whole): an (1, T, H/groups) column block
    # would be 8 lanes wide and fail to lower.
    return pl.BlockSpec((1, H // groups, T), lambda b, g: (b, g, 0))


def _bias_col_spec(T):
    # k-side bias as a (B, T, 1) column for the transposed-space kernels.
    return pl.BlockSpec((1, T, 1), lambda b, g: (b, 0, 0))


def _fwd_pallas_stats(q, k, v, bias, sm_scale, head_dim, interpret):
    B, T, HD = q.shape
    H = HD // head_dim
    groups = _head_groups(
        HD, head_dim, n_blocks=5, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, _ = _specs(T, HD, groups)
    bias_c = jnp.swapaxes(bias, 1, 2)  # (B, T, 1) column for sT space
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_stats, sm_scale=sm_scale, head_dim=head_dim
        ),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, _bias_col_spec(T)],
        out_specs=[qkv_spec, _lse_spec(T, H, groups)],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias_c)


def _fwd_pallas_stats_v2(q, k, v, bias, sm_scale, head_dim, interpret):
    B, T, HD = q.shape
    H = HD // head_dim
    groups = _head_groups(
        HD, head_dim, n_blocks=5, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, bias_spec = _specs(T, HD, groups)  # row bias, normal space
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_stats_v2, sm_scale=sm_scale, head_dim=head_dim
        ),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=[qkv_spec, _lse_spec(T, H, groups)],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias)


def _bwd_pallas_stats(q, k, v, bias, do, lse, sm_scale, head_dim, interpret):
    B, T, HD = q.shape
    H = HD // head_dim
    groups = _head_groups(
        HD, head_dim, n_blocks=8, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, _ = _specs(T, HD, groups)
    bias_c = jnp.swapaxes(bias, 1, 2)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_stats, sm_scale=sm_scale, head_dim=head_dim
        ),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, _bias_col_spec(T), qkv_spec,
                  _lse_spec(T, H, groups)],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, bias_c, do, lse)


def _bwd_pallas_stats_ctx(q, k, v, bias, do, lse, o, sm_scale, head_dim,
                          interpret):
    B, T, HD = q.shape
    H = HD // head_dim
    groups = _head_groups(
        HD, head_dim, n_blocks=9, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, _ = _specs(T, HD, groups)
    bias_c = jnp.swapaxes(bias, 1, 2)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_stats_ctx, sm_scale=sm_scale, head_dim=head_dim
        ),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, _bias_col_spec(T), qkv_spec,
                  _lse_spec(T, H, groups), qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        interpret=interpret,
    )(q, k, v, bias_c, do, lse, o)


def _bvec_spec(HD, groups):
    # (1, HD) projection-bias vectors, lane-grouped like q/k/v.
    return pl.BlockSpec((1, HD // groups), lambda b, g: (0, g))


def _fwd_pallas_stats_v2_qb(q, k, v, bq, bk, bv, bias, sm_scale, head_dim,
                            interpret):
    B, T, HD = q.shape
    H = HD // head_dim
    groups = _head_groups(
        HD, head_dim, n_blocks=5, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, bias_spec = _specs(T, HD, groups)
    bv_spec = _bvec_spec(HD, groups)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_stats_v2_qb, sm_scale=sm_scale, head_dim=head_dim
        ),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bv_spec, bv_spec, bv_spec,
                  bias_spec],
        out_specs=[qkv_spec, _lse_spec(T, H, groups)],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bq.reshape(1, HD), bk.reshape(1, HD), bv.reshape(1, HD), bias)


def _bwd_pallas_stats_ctx_qb(q, k, v, bq, bk, bv, bias, do, lse, o, sm_scale,
                             head_dim, interpret):
    B, T, HD = q.shape
    H = HD // head_dim
    groups = _head_groups(
        HD, head_dim, n_blocks=9, T=T, itemsize=q.dtype.itemsize
    )
    qkv_spec, _ = _specs(T, HD, groups)
    bv_spec = _bvec_spec(HD, groups)
    db_spec = pl.BlockSpec((1, 3, HD // groups), lambda b, g: (b, 0, g))
    bias_c = jnp.swapaxes(bias, 1, 2)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_stats_ctx_qb, sm_scale=sm_scale, head_dim=head_dim
        ),
        grid=(B, groups),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bv_spec, bv_spec, bv_spec,
                  _bias_col_spec(T), qkv_spec, _lse_spec(T, H, groups),
                  qkv_spec],
        out_specs=[qkv_spec, qkv_spec, qkv_spec, db_spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3 + [
            jax.ShapeDtypeStruct((B, 3, HD), jnp.float32)
        ],
        interpret=interpret,
    )(q, k, v, bq.reshape(1, HD), bk.reshape(1, HD), bv.reshape(1, HD),
      bias_c, do, lse, o)


# ---------------------------------------------------------------------------
# GSPMD partitioning
#
# pallas_call lowers to an opaque custom call, which the SPMD partitioner
# cannot split on its own — under a pjit-sharded batch it would all-gather
# the full batch onto every device. The kernel is embarrassingly parallel
# over the batch (grid) and the heads (lane groups), so custom_partitioning
# declares exactly that: inputs and outputs keep whatever sharding they have
# on dim 0 (batch) and dim 2 (the flattened head axis — Megatron TP shards it
# in head-aligned lane groups); T is forced replicated. Each device runs the
# kernel on its local (B/dp, H*d/tp) shard.
# ---------------------------------------------------------------------------


def _bh_only(sharding, mesh, ndim):
    """Keep a NamedSharding's spec on dims (0, 2); replicate the rest."""
    spec = [None] * ndim
    if isinstance(sharding, NamedSharding):
        got = list(sharding.spec) + [None] * ndim
        spec[0] = got[0]
        if ndim == 3:
            spec[2] = got[2]
    return NamedSharding(mesh, P(*spec))


@functools.lru_cache(maxsize=None)
def _fwd_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bias: _fwd_pallas(
            q, k, v, bias, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        return _bh_only(arg_infos[0].sharding, mesh, 3)

    def partition(mesh, arg_infos, result_infos):
        out_sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        batch_spec = out_sh.spec[0]
        arg_shs = (
            out_sh, out_sh, out_sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
        )
        lower = functools.partial(
            _fwd_pallas, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, out_sh, arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t h, b t h, b t h, b u t -> b t h",
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bias, do: _bwd_pallas(
            q, k, v, bias, do, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, sh, sh)

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        batch_spec = sh.spec[0]
        arg_shs = (
            sh, sh, sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
            sh,
        )
        lower = functools.partial(
            _bwd_pallas, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (sh, sh, sh), arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t h, b t h, b t h, b u t, b t h -> b t h, b t h, b t h"
        ),
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_ctx_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bias, do, o: _bwd_ctx_pallas(
            q, k, v, bias, do, o, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, sh, sh)

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        batch_spec = sh.spec[0]
        arg_shs = (
            sh, sh, sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
            sh, sh,
        )
        lower = functools.partial(
            _bwd_ctx_pallas, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (sh, sh, sh), arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t h, b t h, b t h, b u t, b t h, b t h -> "
            "b t h, b t h, b t h"
        ),
    )
    return f


def _lse_sharding(sharding, mesh):
    """lse is (B, H, T): the batch spec lands on dim 0 and the q/k/v lane
    (TP head) spec on dim 1; T replicated."""
    spec = [None] * 3
    if isinstance(sharding, NamedSharding):
        got = list(sharding.spec) + [None] * 3
        spec[0], spec[1] = got[0], got[2]
    return NamedSharding(mesh, P(*spec))


@functools.lru_cache(maxsize=None)
def _fwd_stats_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bias: _fwd_pallas_stats(
            q, k, v, bias, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, _lse_sharding(arg_infos[0].sharding, mesh))

    def partition(mesh, arg_infos, result_infos):
        out_sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        lse_sh = _lse_sharding(arg_infos[0].sharding, mesh)
        batch_spec = out_sh.spec[0]
        arg_shs = (
            out_sh, out_sh, out_sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
        )
        lower = functools.partial(
            _fwd_pallas_stats, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (out_sh, lse_sh), arg_shs

    # Compound factor (e f): the flattened head axis is e heads x f=head_dim
    # lanes, and lse's head axis (dim 1) is the e factor alone — so a TP
    # sharding on the lane axis propagates to lse instead of leaving it
    # output-only (which Shardy would replicate, inserting an all-gather
    # between the fwd and bwd custom calls).
    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t (e f), b t (e f), b t (e f), b u t -> b t (e f), b e t"
        ),
        f=head_dim,
    )
    return f


@functools.lru_cache(maxsize=None)
def _fwd_stats_v2_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bias: _fwd_pallas_stats_v2(
            q, k, v, bias, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, _lse_sharding(arg_infos[0].sharding, mesh))

    def partition(mesh, arg_infos, result_infos):
        out_sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        lse_sh = _lse_sharding(arg_infos[0].sharding, mesh)
        batch_spec = out_sh.spec[0]
        arg_shs = (
            out_sh, out_sh, out_sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
        )
        lower = functools.partial(
            _fwd_pallas_stats_v2, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (out_sh, lse_sh), arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t (e f), b t (e f), b t (e f), b u t -> b t (e f), b e t"
        ),
        f=head_dim,
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_stats_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bias, do, lse: _bwd_pallas_stats(
            q, k, v, bias, do, lse, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, sh, sh)

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        batch_spec = sh.spec[0]
        arg_shs = (
            sh, sh, sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
            sh, _lse_sharding(arg_infos[0].sharding, mesh),
        )
        lower = functools.partial(
            _bwd_pallas_stats, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (sh, sh, sh), arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t (e f), b t (e f), b t (e f), b u t, b t (e f), b e t -> "
            "b t (e f), b t (e f), b t (e f)"
        ),
        f=head_dim,
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_stats_ctx_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bias, do, lse, o: _bwd_pallas_stats_ctx(
            q, k, v, bias, do, lse, o, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, sh, sh)

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        batch_spec = sh.spec[0]
        arg_shs = (
            sh, sh, sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
            sh, _lse_sharding(arg_infos[0].sharding, mesh), sh,
        )
        lower = functools.partial(
            _bwd_pallas_stats_ctx, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (sh, sh, sh), arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t (e f), b t (e f), b t (e f), b u t, b t (e f), b e t, "
            "b t (e f) -> b t (e f), b t (e f), b t (e f)"
        ),
        f=head_dim,
    )
    return f


def _bv_sharding(sharding, mesh):
    """(HD,) bias vectors: the q/k/v lane (TP head) spec lands on dim 0."""
    spec = [None]
    if isinstance(sharding, NamedSharding):
        got = list(sharding.spec) + [None] * 3
        spec[0] = got[2]
    return NamedSharding(mesh, P(*spec))


def _db_sharding(sharding, mesh):
    """(B, 3, HD) bias-grad partials: batch on dim 0, TP lanes on dim 2."""
    spec = [None] * 3
    if isinstance(sharding, NamedSharding):
        got = list(sharding.spec) + [None] * 3
        spec[0], spec[2] = got[0], got[2]
    return NamedSharding(mesh, P(*spec))


@functools.lru_cache(maxsize=None)
def _fwd_stats_v2_qb_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bq, bk, bv, bias: _fwd_pallas_stats_v2_qb(
            q, k, v, bq, bk, bv, bias, sm_scale, head_dim, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, _lse_sharding(arg_infos[0].sharding, mesh))

    def partition(mesh, arg_infos, result_infos):
        out_sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        lse_sh = _lse_sharding(arg_infos[0].sharding, mesh)
        bv_sh = _bv_sharding(arg_infos[0].sharding, mesh)
        batch_spec = out_sh.spec[0]
        arg_shs = (
            out_sh, out_sh, out_sh, bv_sh, bv_sh, bv_sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
        )
        lower = functools.partial(
            _fwd_pallas_stats_v2_qb, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (out_sh, lse_sh), arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t (e f), b t (e f), b t (e f), (e f), (e f), (e f), b u t "
            "-> b t (e f), b e t"
        ),
        f=head_dim,
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_stats_ctx_qb_cp(sm_scale, head_dim, interpret):
    f = custom_partitioning(
        lambda q, k, v, bq, bk, bv, bias, do, lse, o:
        _bwd_pallas_stats_ctx_qb(
            q, k, v, bq, bk, bv, bias, do, lse, o, sm_scale, head_dim,
            interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        return (sh, sh, sh, _db_sharding(arg_infos[0].sharding, mesh))

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_only(arg_infos[0].sharding, mesh, 3)
        db_sh = _db_sharding(arg_infos[0].sharding, mesh)
        bv_sh = _bv_sharding(arg_infos[0].sharding, mesh)
        batch_spec = sh.spec[0]
        arg_shs = (
            sh, sh, sh, bv_sh, bv_sh, bv_sh,
            NamedSharding(mesh, P(batch_spec, None, None)),
            sh, _lse_sharding(arg_infos[0].sharding, mesh), sh,
        )
        lower = functools.partial(
            _bwd_pallas_stats_ctx_qb, sm_scale=sm_scale, head_dim=head_dim,
            interpret=interpret,
        )
        return mesh, lower, (sh, sh, sh, db_sh), arg_shs

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t (e f), b t (e f), b t (e f), (e f), (e f), (e f), b u t, "
            "b t (e f), b e t, b t (e f) -> "
            "b t (e f), b t (e f), b t (e f), b r (e f)"
        ),
        f=head_dim,
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention(q, k, v, bias, sm_scale, head_dim, interpret):
    o, _ = _attention_fwd(q, k, v, bias, sm_scale, head_dim, interpret)
    return o


def _attention_fwd(q, k, v, bias, sm_scale, head_dim, interpret):
    o = _fwd_cp(sm_scale, head_dim, interpret)(q, k, v, bias)
    return o, (q, k, v, bias)


def _attention_bwd(sm_scale, head_dim, interpret, res, do):
    q, k, v, bias = res
    dq, dk, dv = _bwd_cp(sm_scale, head_dim, interpret)(q, k, v, bias, do)
    return dq, dk, dv, None


_attention.defvjp(_attention_fwd, _attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_ctx(q, k, v, bias, sm_scale, head_dim, interpret):
    o, _ = _attention_ctx_fwd(q, k, v, bias, sm_scale, head_dim, interpret)
    return o


def _attention_ctx_fwd(q, k, v, bias, sm_scale, head_dim, interpret):
    from jax.ad_checkpoint import checkpoint_name

    o = _fwd_cp(sm_scale, head_dim, interpret)(q, k, v, bias)
    # o joins the residuals: the flash-style delta = rowsum(do * o) replaces
    # the (T, T) sum(p * dp) pass in the backward. The "attn_ctx" checkpoint
    # name is applied HERE, before the residual capture, so the named var IS
    # the residual var: under save_attn_ctx/save_ctx_act/save_matmul_inputs
    # the policy-saved tensor directly feeds the backward (the forward
    # kernel DCEs out of the remat replay), and under nothing_saveable the
    # replayed forward had to produce it for the out-projection's dW anyway.
    # (Naming a post-hoc copy in the model instead would leave the residual
    # an unsaved upstream var and silently re-run the kernel — the round-3
    # o-residual trap.)
    o = checkpoint_name(o, "attn_ctx")
    return o, (q, k, v, bias, o)


def _attention_ctx_bwd(sm_scale, head_dim, interpret, res, do):
    q, k, v, bias, o = res
    dq, dk, dv = _bwd_ctx_cp(sm_scale, head_dim, interpret)(
        q, k, v, bias, do, o
    )
    return dq, dk, dv, None


_attention_ctx.defvjp(_attention_ctx_fwd, _attention_ctx_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_stats(q, k, v, bias, sm_scale, head_dim, interpret):
    o, _ = _attention_stats_fwd(q, k, v, bias, sm_scale, head_dim, interpret)
    return o


def _attention_stats_fwd(q, k, v, bias, sm_scale, head_dim, interpret):
    o, lse = _fwd_stats_cp(sm_scale, head_dim, interpret)(q, k, v, bias)
    return o, (q, k, v, bias, lse)


def _attention_stats_bwd(sm_scale, head_dim, interpret, res, do):
    q, k, v, bias, lse = res
    dq, dk, dv = _bwd_stats_cp(sm_scale, head_dim, interpret)(
        q, k, v, bias, do, lse
    )
    return dq, dk, dv, None


_attention_stats.defvjp(_attention_stats_fwd, _attention_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_stats_v2(q, k, v, bias, sm_scale, head_dim, interpret):
    o, _ = _attention_stats_v2_fwd(
        q, k, v, bias, sm_scale, head_dim, interpret
    )
    return o


def _attention_stats_v2_fwd(q, k, v, bias, sm_scale, head_dim, interpret):
    from jax.ad_checkpoint import checkpoint_name

    # Normal-space forward (same compute as the adopted stats-free kernel +
    # a T-float lse relayout per head); the backward is the v1
    # transposed-space stats kernel, which expects the k-side bias as a
    # column — it transposes it itself in _bwd_pallas_stats.
    o, lse = _fwd_stats_v2_cp(sm_scale, head_dim, interpret)(q, k, v, bias)
    # Name the lse residual so a named-checkpoint policy can cover it: the
    # backward reads lse (not o), while the model's out-projection dW reads
    # o (the model names it "attn_ctx" on the stats paths) — saving
    # {attn_ctx, attn_lse} (save_attn_ctx_lse) therefore DCEs the attention
    # forward from the remat replay AND keeps the one-pass p = exp(s - lse)
    # rebuild (lse is ~1 MB/layer vs o's ~49 MB at B=48 x 10 s).
    lse = checkpoint_name(lse, "attn_lse")
    return o, (q, k, v, bias, lse)


_attention_stats_v2.defvjp(_attention_stats_v2_fwd, _attention_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_stats_v3(q, k, v, bias, sm_scale, head_dim, interpret):
    o, _ = _attention_stats_v3_fwd(
        q, k, v, bias, sm_scale, head_dim, interpret
    )
    return o


def _attention_stats_v3_fwd(q, k, v, bias, sm_scale, head_dim, interpret):
    from jax.ad_checkpoint import checkpoint_name

    # Same forward as v2 (normal-space kernel + in-register lse relayout);
    # the backward additionally consumes o, replacing the (T, T)
    # ``sum(p * dp)`` delta pass with the flash ``rowsum(do * o)`` identity.
    # BOTH residuals are named here, on the residual vars themselves: under
    # save_qk_ctx / save_attn_ctx_lse the policy-saved tensors feed the
    # backward directly (no extra HBM vs v2 — o is the "attn_ctx" the
    # out-projection's dW needs saved anyway). The model must NOT re-name
    # the returned o (a post-hoc copy would double-save it).
    o, lse = _fwd_stats_v2_cp(sm_scale, head_dim, interpret)(q, k, v, bias)
    lse = checkpoint_name(lse, "attn_lse")
    o = checkpoint_name(o, "attn_ctx")
    return o, (q, k, v, bias, lse, o)


def _attention_stats_v3_bwd(sm_scale, head_dim, interpret, res, do):
    q, k, v, bias, lse, o = res
    dq, dk, dv = _bwd_stats_ctx_cp(sm_scale, head_dim, interpret)(
        q, k, v, bias, do, lse, o
    )
    return dq, dk, dv, None


_attention_stats_v3.defvjp(_attention_stats_v3_fwd, _attention_stats_v3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _attention_stats_v3_qb(q, k, v, bq, bk, bv, bias, sm_scale, head_dim,
                           interpret):
    o, _ = _attention_stats_v3_qb_fwd(
        q, k, v, bq, bk, bv, bias, sm_scale, head_dim, interpret
    )
    return o


def _attention_stats_v3_qb_fwd(q, k, v, bq, bk, bv, bias, sm_scale, head_dim,
                               interpret):
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _fwd_stats_v2_qb_cp(sm_scale, head_dim, interpret)(
        q, k, v, bq, bk, bv, bias
    )
    lse = checkpoint_name(lse, "attn_lse")
    o = checkpoint_name(o, "attn_ctx")
    return o, (q, k, v, bq, bk, bv, bias, lse, o)


def _attention_stats_v3_qb_bwd(sm_scale, head_dim, interpret, res, do):
    q, k, v, bq, bk, bv, bias, lse, o = res
    dq, dk, dv, db = _bwd_stats_ctx_qb_cp(sm_scale, head_dim, interpret)(
        q, k, v, bq, bk, bv, bias, do, lse, o
    )
    # Per-batch-row partials -> (HD,); under a sharded batch GSPMD inserts
    # the cross-shard psum here.
    dbsum = jnp.sum(db, axis=0)
    return (dq, dk, dv, dbsum[0].astype(bq.dtype), dbsum[1].astype(bk.dtype),
            dbsum[2].astype(bv.dtype), None)


_attention_stats_v3_qb.defvjp(
    _attention_stats_v3_qb_fwd, _attention_stats_v3_qb_bwd
)


def short_t_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pad_mask: jnp.ndarray,
    sm_scale: float | None = None,
    interpret: bool | None = None,
    save_stats: bool = False,
) -> jnp.ndarray:
    """Bidirectional attention with k-side padding, fused for short T.

    Args:
        q, k, v: (B, T, H, d) activations.
        pad_mask: (B, T) bool, True = valid key position.
        sm_scale: score scale; default ``d ** -0.5``.
        interpret: run the Pallas interpreter (for CPU tests). Defaults to
            True off-TPU.
        save_stats: also save the forward's per-row log-sum-exp as a VJP
            residual so the backward rebuilds ``p = exp(s - lse)`` in one
            pass (skips the max/sum/divide recompute). Only profitable under
            remat policies that replay the forward anyway (nothing_saveable):
            under named-checkpoint policies the extra residual is not a
            policy-saved value, which would force a forward replay (the
            round-3 ``o``-residual lesson).

    Returns:
        (B, T, H, d) attention outputs, same dtype as ``q``.
    """
    B, T, H, d = q.shape
    flat = lambda x: x.reshape(B, T, H * d)  # noqa: E731
    o = short_t_attention_flat(
        flat(q), flat(k), flat(v), pad_mask, d,
        sm_scale=sm_scale, interpret=interpret, save_stats=save_stats,
        o_residual=False,
    )
    return o.reshape(B, T, H, d)


def short_t_attention_flat(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pad_mask: jnp.ndarray,
    head_dim: int,
    sm_scale: float | None = None,
    interpret: bool | None = None,
    save_stats: bool = False,
    o_residual: bool = True,
    qkv_bias: tuple | None = None,
) -> jnp.ndarray:
    """``short_t_attention`` on the flat (B, T, H*d) projection layout.

    The model's q/k/v projections already produce (B, T, D) and the kernel
    consumes lane slices of exactly that, so this entry skips the 4D
    reshape round-trip. ``o_residual=True`` (default) additionally saves the
    output as a VJP residual and uses the flash-style
    ``delta = rowsum(do * o)`` backward — one (T, d) pass instead of the
    (T, T) ``sum(p * dp)`` multiply+reduction. The flat output is the tensor
    the model names "attn_ctx", so named-checkpoint policies that save it
    (save_attn_ctx / save_ctx_act) cover the residual with no extra forward
    replay; under nothing_saveable the replayed forward had to produce it
    for the out-projection's dW anyway.
    """
    B, T, HD = q.shape
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Large-negative finite bias (like the XLA path in models/wav2vec2.py):
    # a fully-masked row (e.g. an eval dummy with input_length=1) then yields
    # a uniform distribution instead of exp(-inf + inf) = NaN poisoning the
    # summed loss.
    bias = jnp.where(pad_mask, 0.0, -1e30).astype(jnp.float32)[:, None, :]
    if qkv_bias is not None:
        # Projection biases applied in-kernel (requires the v3 stats path);
        # the backward emits dbq/dbk/dbv as in-register row sums.
        assert save_stats == "v3", "qkv_bias requires save_stats='v3'"
        bq, bk, bv = (b.astype(q.dtype) for b in qkv_bias)
        return _attention_stats_v3_qb(
            q, k, v, bq, bk, bv, bias, sm_scale, head_dim, interpret
        )
    if save_stats == "v3":
        # v2's forward; the backward reads BOTH policy-saved residuals
        # (lse for the one-pass p rebuild, o for the flash delta identity).
        fn = _attention_stats_v3
    elif save_stats == "v2":
        # Normal-space forward + lse rows via a T-float in-register relayout
        # per head; the v1 transposed-space backward consumes them.
        fn = _attention_stats_v2
    elif save_stats:
        fn = _attention_stats
    elif o_residual:
        fn = _attention_ctx
    else:
        fn = _attention
    return fn(q, k, v, bias, sm_scale, head_dim, interpret)
