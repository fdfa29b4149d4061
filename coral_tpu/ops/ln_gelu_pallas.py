"""Fused LayerNorm + exact GELU kernel (Pallas TPU).

Every feature-encoder conv block in wav2vec2 (XLS-R: ``feat_extract_norm=
"layer"``) runs LayerNorm-over-channels followed by exact GELU on tensors up
to (B, 32000, 512). XLA splits this into several fusions with fp32 stat
tensors round-tripping through HBM (~40 ms/step total at B=32 x 10 s,
forward + backward + the rematerialised recompute). This kernel does each
direction in one pass:

- forward: read x, compute row stats in fp32 in VMEM, write
  ``gelu(norm(x) * gamma + beta)``;
- backward: re-derive the stats from x (cheap, VMEM-resident), apply the
  standard LN backward with the GELU derivative folded in, and emit
  per-batch-row dgamma/dbeta partials (accumulated across the row's time
  tiles in fp32 VMEM scratch). The final (C,) reductions run as plain XLA
  sums outside the kernel, so a batch-sharded lowering reduces across shards
  with an ordinary psum — both pallas calls stay embarrassingly
  batch-parallel for custom_partitioning.

GELU is the exact (erf) variant via the shared clamped minimax polynomials
(``ops/gelu_dropout_pallas._phi``/``_dgelu``). Off-TPU composes plain ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from .gelu_dropout_pallas import _dgelu, _gelu_parts, gelu_poly

_TILE = 512  # rows per grid step
_EPS = 1e-5  # default; call sites thread the model's layer_norm_eps through


def _norm(x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mu
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return centered * rstd, rstd


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, apply_gelu: bool, eps: float):
    x = x_ref[0].astype(jnp.float32)
    n, _ = _norm(x, eps)
    z = n * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    if apply_gelu:
        z, _ = _gelu_parts(z)
    y_ref[0] = z.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, b_ref, dy_ref, dx_ref, dg_ref, db_ref, acc,
                *, n_rows: int, apply_gelu: bool, eps: float):
    t = pl.program_id(1)
    t_last = pl.num_programs(1) - 1

    @pl.when(t == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[0].astype(jnp.float32)
    n, rstd = _norm(x, eps)
    gamma = g_ref[...].astype(jnp.float32)
    g = dy_ref[0].astype(jnp.float32)
    if apply_gelu:
        z = n * gamma + b_ref[...].astype(jnp.float32)
        g = g * _dgelu(z)

    dn = g * gamma
    dx = (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - n * jnp.mean(dn * n, axis=-1, keepdims=True)
    ) * rstd
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # The last tile may be ragged: rows past n_rows hold uninitialised pad
    # data whose dx is discarded, but the dgamma/dbeta accumulators must not
    # see them (NaN garbage would also poison the sums; where() zeroes it).
    row = t * g.shape[0] + jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    valid = row < n_rows
    g = jnp.where(valid, g, 0.0)
    gn = jnp.where(valid, g * n, 0.0)
    acc[0, :] += jnp.sum(gn, axis=0)
    acc[1, :] += jnp.sum(g, axis=0)

    @pl.when(t == t_last)
    def _():
        dg_ref[0, 0, :] = acc[0, :]
        db_ref[0, 0, :] = acc[1, :]


def _fwd_pallas(x, gamma, beta, interpret, apply_gelu=True, eps=_EPS):
    B, T, C = x.shape
    blk = pl.BlockSpec((1, _TILE, C), lambda b, t: (b, t, 0))
    vec = pl.BlockSpec((C,), lambda b, t: (0,))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, apply_gelu=apply_gelu, eps=eps),
        grid=(B, pl.cdiv(T, _TILE)),
        in_specs=[blk, vec, vec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, gamma, beta)


def _bwd_pallas(x, gamma, beta, dy, interpret, apply_gelu=True, eps=_EPS):
    """Returns (dx, dg_rows (B,1,C) fp32, db_rows (B,1,C) fp32)."""
    B, T, C = x.shape
    blk = pl.BlockSpec((1, _TILE, C), lambda b, t: (b, t, 0))
    vec = pl.BlockSpec((C,), lambda b, t: (0,))
    row_out = pl.BlockSpec((1, 1, C), lambda b, t: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_rows=T, apply_gelu=apply_gelu,
                          eps=eps),
        grid=(B, pl.cdiv(T, _TILE)),
        in_specs=[blk, vec, vec, blk],
        out_specs=[blk, row_out, row_out],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=interpret,
    )(x, gamma, beta, dy)


def _row_only(sharding, mesh, ndim):
    spec = [None] * ndim
    if isinstance(sharding, NamedSharding) and len(sharding.spec):
        spec[0] = sharding.spec[0]
    return NamedSharding(mesh, P(*spec))


@functools.lru_cache(maxsize=None)
def _fwd_cp(interpret, apply_gelu=True, eps=_EPS):
    f = custom_partitioning(
        lambda x, g, b: _fwd_pallas(x, g, b, interpret, apply_gelu, eps)
    )

    def infer(mesh, arg_infos, result_infos):
        return _row_only(arg_infos[0].sharding, mesh, 3)

    def partition(mesh, arg_infos, result_infos):
        out_sh = _row_only(arg_infos[0].sharding, mesh, 3)
        rep = NamedSharding(mesh, P(None))
        lower = lambda x, g, b: _fwd_pallas(  # noqa: E731
            x, g, b, interpret, apply_gelu, eps
        )
        return mesh, lower, out_sh, (out_sh, rep, rep)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t c, c, c -> b t c",
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_cp(interpret, apply_gelu=True, eps=_EPS):
    f = custom_partitioning(
        lambda x, g, b, dy: _bwd_pallas(
            x, g, b, dy, interpret, apply_gelu, eps
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh = _row_only(arg_infos[0].sharding, mesh, 3)
        return (sh, sh, sh)

    def partition(mesh, arg_infos, result_infos):
        sh = _row_only(arg_infos[0].sharding, mesh, 3)
        rep = NamedSharding(mesh, P(None))
        lower = lambda x, g, b, dy: _bwd_pallas(  # noqa: E731
            x, g, b, dy, interpret, apply_gelu, eps
        )
        return mesh, lower, (sh, sh, sh), (sh, rep, rep, sh)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t c, c, c, b t c -> b t c, b u c, b u c",
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln_gelu(x, gamma, beta, interpret, apply_gelu, eps):
    return _fwd_cp(interpret, apply_gelu, eps)(x, gamma, beta)


def _ln_gelu_fwd(x, gamma, beta, interpret, apply_gelu, eps):
    return (
        _ln_gelu(x, gamma, beta, interpret, apply_gelu, eps),
        (x, gamma, beta),
    )


def _ln_gelu_bwd(interpret, apply_gelu, eps, res, dy):
    x, gamma, beta = res
    dx, dg_rows, db_rows = _bwd_cp(interpret, apply_gelu, eps)(
        x, gamma, beta, dy
    )
    # Batch reduction as plain XLA: under a sharded batch GSPMD inserts the
    # cross-shard psum here.
    dg = jnp.sum(dg_rows[:, 0, :], axis=0).astype(gamma.dtype)
    db = jnp.sum(db_rows[:, 0, :], axis=0).astype(beta.dtype)
    return dx, dg, db


_ln_gelu.defvjp(_ln_gelu_fwd, _ln_gelu_bwd)


def ln_gelu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    interpret: bool | None = None,
    eps: float = _EPS,
) -> jnp.ndarray:
    """``gelu(layer_norm(x) * gamma + beta)`` in one fused pass per direction.

    Args:
        x: (B, T, C) values; stats are computed over C in fp32.
        gamma, beta: (C,) affine parameters.
        eps: LayerNorm epsilon (the model's ``layer_norm_eps``).

    Returns:
        Same shape/dtype as ``x``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        c = x.astype(jnp.float32) - mu
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        n = c * jax.lax.rsqrt(var + eps)
        z = n * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        return gelu_poly(z).astype(x.dtype)
    return _ln_gelu(x, gamma, beta, interpret, True, eps)


def ln_fused(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    interpret: bool | None = None,
    eps: float = _EPS,
) -> jnp.ndarray:
    """Plain fused LayerNorm (no activation): one pass per direction."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        mu = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        c = x.astype(jnp.float32) - mu
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        n = c * jax.lax.rsqrt(var + eps)
        z = n * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        return z.astype(x.dtype)
    return _ln_gelu(x, gamma, beta, interpret, False, eps)
