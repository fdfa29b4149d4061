"""Patched dq-backward wrapper for the stock Pallas flash-attention kernel.

Adapted from ``jax.experimental.pallas.ops.tpu.flash_attention``
(Apache-2.0). The stock ``_flash_attention_bwd_dq`` broadcasts the ``di``
contraction to ``block_k_major`` lanes —

    di = jnp.broadcast_to(di[..., None], (*di.shape, block_k_major))

— while its BlockSpec (and the kernel body) only ever read the first
``MIN_BLOCK_SIZE`` lanes. At whisper-small training shapes that is a
f32(B=16, H=12, T=1536, 768) materialisation, ~906 MB of dead HBM writes
per layer-scan pass (~16 ms/step measured on v5e). This copy broadcasts to
``MIN_BLOCK_SIZE``, matching the spec and the dkv wrapper, and strips the
causal / attention-bias paths this repo never exercises (the whisper
encoder is bidirectional and bias-free; padding is handled by segment ids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.flash_attention import (
    MIN_BLOCK_SIZE,
    NUM_LANES,
    NUM_SUBLANES,
    _flash_attention_dq_kernel,
    _verify_block,
)


def flash_attention_bwd_dq_fixed(
    q,
    k,
    v,
    segment_ids,
    l,
    m,
    do,
    di,
    *,
    block_q_major: int,
    block_k_major: int,
    block_k: int,
    sm_scale: float,
    mask_value: float,
    debug: bool = False,
):
    """Non-causal, bias-free dq backward with the di broadcast fixed."""
    batch_size, num_heads, q_seq_len, head_dim = q.shape
    _, _, kv_seq_len, _ = k.shape
    _verify_block("block_q_dq", "q_seq_len", block_q_major, q_seq_len)
    _verify_block("block_k_major_dq", "kv_seq_len", block_k_major, kv_seq_len)
    _verify_block("block_k_dq", "block_k", block_k, kv_seq_len)

    # Broadcast the per-row scalars to exactly the lanes the kernel reads.
    m = jnp.broadcast_to(m[..., None], (*m.shape, MIN_BLOCK_SIZE))
    l = jnp.broadcast_to(l[..., None], (*l.shape, MIN_BLOCK_SIZE))
    di = jnp.broadcast_to(di[..., None], (*di.shape, MIN_BLOCK_SIZE))

    grid = (
        batch_size,
        num_heads,
        q_seq_len // block_q_major,
        kv_seq_len // block_k_major,
    )

    def qo_index_map(batch_index, head_index, q_seq_index, _):
        return (batch_index, head_index, q_seq_index, 0)

    qo_spec = pl.BlockSpec((1, 1, block_q_major, head_dim), qo_index_map)

    def kv_index_map(batch_index, head_index, q_seq_index, kv_seq_index):
        return (batch_index, head_index, kv_seq_index, 0)

    kv_spec = pl.BlockSpec((1, 1, block_k_major, head_dim), kv_index_map)

    def lm_index_map(batch_index, head_index, q_seq_index, _):
        return (batch_index, head_index, q_seq_index, 0)

    lm_spec = pl.BlockSpec((1, 1, block_q_major, MIN_BLOCK_SIZE), lm_index_map)
    di_spec = pl.BlockSpec((1, 1, block_q_major, MIN_BLOCK_SIZE), qo_index_map)

    q_segment_ids_spec = kv_segment_ids_spec = None
    q_segment_ids = kv_segment_ids = None
    if segment_ids is not None:

        def q_segment_ids_index_map(batch_index, head_index, q_seq_index, _):
            del head_index
            return (batch_index, q_seq_index, 0)

        def kv_segment_ids_index_map(
            batch_index, head_index, q_seq_index, kv_seq_index
        ):
            del head_index
            return (batch_index, 0, kv_seq_index)

        q_segment_ids_spec = pl.BlockSpec(
            (1, block_q_major, NUM_LANES), q_segment_ids_index_map
        )
        kv_segment_ids_spec = pl.BlockSpec(
            (1, NUM_SUBLANES, block_k_major), kv_segment_ids_index_map
        )
        q_segment_ids = jax.lax.broadcast_in_dim(
            segment_ids.q, (batch_size, q_seq_len, NUM_LANES), (0, 1)
        )
        kv_segment_ids = jax.lax.broadcast_in_dim(
            segment_ids.kv, (batch_size, NUM_SUBLANES, kv_seq_len), (0, 2)
        )

    in_specs = [
        qo_spec,
        kv_spec,
        kv_spec,
        None,  # ab
        q_segment_ids_spec,
        kv_segment_ids_spec,
        lm_spec,
        lm_spec,
        qo_spec,  # do
        di_spec,
    ]
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype), None]
    out_specs = [
        pl.BlockSpec((1, 1, block_q_major, head_dim), qo_index_map),
        None,
    ]
    scratch_shapes = [pltpu.VMEM((block_q_major, head_dim), jnp.float32)]

    kernel = functools.partial(
        _flash_attention_dq_kernel,
        sm_scale=sm_scale,
        causal=False,
        mask_value=mask_value,
        block_k=block_k,
        kv_seq_len=kv_seq_len,
    )
    name_scope = (
        f"flash_mha_bwd_dq_fixed_{block_q_major=}_{block_k_major=}_{block_k=}"
    )
    with jax.named_scope(name_scope):
        dq, _ = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shapes,
            debug=debug,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary",
                )
            ),
        )(q, k, v, None, q_segment_ids, kv_segment_ids, l, m, do, di)
    return dq
