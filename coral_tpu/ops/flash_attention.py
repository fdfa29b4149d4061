"""GSPMD-partitioned blocked flash attention for long sequences.

The Whisper encoder attends over T=1500 mel frames; XLA materialises the fp32
``(B, H, T, T)`` score/softmax tensors in HBM (~110 MB each per whisper-small
layer at B=16), while the stock Pallas flash kernel
(``jax.experimental.pallas.ops.tpu.flash_attention``) streams them through
VMEM — measured 12 ms vs 21 ms value+grad per layer. This module adds the two
pieces that kernel lacks for production use here:

- **partitioning**: pallas custom calls are opaque to the SPMD partitioner
  (a pjit-sharded batch would be all-gathered); ``custom_partitioning``
  declares the computation batch/head-parallel, and a ``custom_vjp`` routes
  the backward through a partitioned wrapper too (the backward lower function
  recomputes the flash forward per shard — the whisper encoder runs under
  full rematerialisation anyway, so this mirrors the existing cost shape);
- **ragged T**: inputs are padded to the 512/768 block grid with segment ids
  masking the padded keys.

For the short-T wav2vec2 shapes (T~500, d=64) the whole-row kernel in
``ops/attention_pallas.py`` is faster than both this and XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _block_geometry(T: int):
    """Padded length and block size: 768 blocks measured best across the
    board at T=1536 (512-dkv: -3%)."""
    Tp = -(-T // 512) * 512
    blk = 768 if Tp % 768 == 0 else 512
    return Tp, blk


def _padded_inputs(q, k, v, *extra):
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    B, _, T, _ = q.shape
    Tp, blk = _block_geometry(T)
    pad = Tp - T
    if pad:
        p4 = lambda x: jnp.pad(  # noqa: E731
            x, ((0, 0), (0, 0), (0, pad), (0, 0))
        )
        q, k, v = p4(q), p4(k), p4(v)
        extra = tuple(p4(x) for x in extra)
    ids = jnp.pad(jnp.ones((B, T), jnp.int32), ((0, 0), (0, pad)))
    return (q, k, v, *extra), SegmentIds(q=ids, kv=ids), blk, pad


def _flash(q, k, v):
    """Stock flash kernel over (B, H, T, d) with T padded to the block grid."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    T, d = q.shape[2], q.shape[3]
    (q, k, v), seg, blk, _ = _padded_inputs(q, k, v)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(
        q, k, v, segment_ids=seg, causal=False,
        sm_scale=float(d) ** -0.5, block_sizes=sizes,
    )
    return out[:, :, :T, :]


def _flash_res(q, k, v):
    """Forward that also returns the softmax row stats (l, m) so the
    backward can SKIP its forward recompute: (o unpadded, l, m padded)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    T, d = q.shape[2], q.shape[3]
    (q, k, v), seg, blk, _ = _padded_inputs(q, k, v)
    sizes = _fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    o, l, m = _fa._flash_attention(
        q, k, v, None, seg, True, False, float(d) ** -0.5, sizes, False
    )
    return o[:, :, :T, :], l, m


def _bh_sharding(sharding, mesh):
    spec = [None] * 4
    if isinstance(sharding, NamedSharding):
        got = list(sharding.spec) + [None] * 4
        spec[0], spec[1] = got[0], got[1]
    return NamedSharding(mesh, P(*spec))


@functools.lru_cache(maxsize=None)
def _fwd_cp():
    f = custom_partitioning(lambda q, k, v: _flash(q, k, v))

    def infer(mesh, arg_infos, result_infos):
        return _bh_sharding(arg_infos[0].sharding, mesh)

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_sharding(arg_infos[0].sharding, mesh)
        return mesh, _flash, sh, (sh, sh, sh)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b h t d, b h t d, b h t d -> b h t d",
    )
    return f


def _grads(q, k, v, do, o=None, l=None, m=None):
    """Explicit flash backward: the stock dkv kernel plus the patched dq
    wrapper (``ops/_flash_bwd_patch.py`` — the stock one broadcasts ``di``
    to ``block_k_major`` lanes of which the kernel reads 128, a ~906 MB
    dead materialisation at whisper-small shapes, ~16 ms/step). With
    (o, l, m) handed in as saved residuals the forward recompute is
    skipped entirely (~1.9 ms/layer at whisper-small); without them it
    runs here, mirroring full rematerialisation."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    from ._flash_bwd_patch import flash_attention_bwd_dq_fixed

    T, d = q.shape[2], q.shape[3]
    if o is None:
        (q, k, v, do), seg, blk, pad = _padded_inputs(q, k, v, do)
    else:
        (q, k, v, do, o), seg, blk, pad = _padded_inputs(q, k, v, do, o)
    scale = float(d) ** -0.5
    sizes = _fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    if o is None:
        o, l, m = _fa._flash_attention(
            q, k, v, None, seg, True, False, scale, sizes, False
        )
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    dk, dv = _fa._flash_attention_bwd_dkv(
        q, k, v, None, seg, l, m, do, di,
        block_q_major=blk, block_k_major=blk, block_k=blk, block_q=blk,
        sm_scale=scale, causal=False,
        mask_value=_fa.DEFAULT_MASK_VALUE, debug=False,
    )
    dq = flash_attention_bwd_dq_fixed(
        q, k, v, seg, l, m, do, di,
        block_q_major=blk, block_k_major=blk, block_k=blk,
        sm_scale=scale, mask_value=_fa.DEFAULT_MASK_VALUE,
    )
    if pad:
        unpad = lambda x: x[:, :, :T, :]  # noqa: E731
        return unpad(dq), unpad(dk), unpad(dv)
    return dq, dk, dv


def _bh3_sharding(sharding, mesh):
    spec = [None] * 3
    if isinstance(sharding, NamedSharding):
        got = list(sharding.spec) + [None] * 3
        spec[0], spec[1] = got[0], got[1]
    return NamedSharding(mesh, P(*spec))


@functools.lru_cache(maxsize=None)
def _fwd_res_cp():
    f = custom_partitioning(lambda q, k, v: _flash_res(q, k, v))

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_sharding(arg_infos[0].sharding, mesh)
        sh3 = _bh3_sharding(arg_infos[0].sharding, mesh)
        return (sh, sh3, sh3)

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_sharding(arg_infos[0].sharding, mesh)
        sh3 = _bh3_sharding(arg_infos[0].sharding, mesh)
        return mesh, _flash_res, (sh, sh3, sh3), (sh, sh, sh)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b h t d, b h t d, b h t d -> b h t d, b h s, b h s"
        ),
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_cp():
    f = custom_partitioning(
        lambda q, k, v, do, o, l, m: _grads(q, k, v, do, o, l, m)
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _bh_sharding(arg_infos[0].sharding, mesh)
        return (sh, sh, sh)

    def partition(mesh, arg_infos, result_infos):
        sh = _bh_sharding(arg_infos[0].sharding, mesh)
        sh3 = _bh3_sharding(arg_infos[0].sharding, mesh)
        lower = lambda q, k, v, do, o, l, m: _grads(  # noqa: E731
            q, k, v, do, o, l, m
        )
        return mesh, lower, (sh, sh, sh), (sh, sh, sh, sh, sh, sh3, sh3)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b h t d, b h t d, b h t d, b h t d, b h t d, b h s, b h s "
            "-> b h t d, b h t d, b h t d"
        ),
    )
    return f


@jax.custom_vjp
def _attention(q, k, v):
    return _fwd_cp()(q, k, v)


def _attention_fwd(q, k, v):
    from jax.ad_checkpoint import checkpoint_name

    o, l, m = _fwd_res_cp()(q, k, v)
    # Name the residuals ON the residual vars (the round-3 lesson: naming a
    # downstream copy leaves the residual unsaved and the forward replays).
    # A policy saving {flash_o, flash_l, flash_m} alongside q/k/v then DCEs
    # both the remat replay AND the backward's own forward recompute of
    # this kernel — whisper's save_matmul_inputs does exactly that.
    o = checkpoint_name(o, "flash_o")
    l = checkpoint_name(l, "flash_l")
    m = checkpoint_name(m, "flash_m")
    return o, (q, k, v, o, l, m)


def _attention_bwd(res, do):
    q, k, v, o, l, m = res
    return tuple(_bwd_cp()(q, k, v, do, o, l, m))


_attention.defvjp(_attention_fwd, _attention_bwd)


def flash_self_attention(q, k, v):
    """Non-causal unmasked self-attention for (B, T, H, d) activations."""
    bht = lambda x: jnp.transpose(x, (0, 2, 1, 3))  # noqa: E731
    return bht(_attention(bht(q), bht(k), bht(v)))
