"""Fused dropout kernel (Pallas TPU) with in-kernel PRNG.

XLA lowers ``jax.random.bernoulli`` dropout as: a non-fusible
``rng-bit-generator`` writing 4 bytes of raw bits per element to HBM, a
threshold fusion reading them back, and the mask consumer — ~1.3 ms per
encoder layer at B=32 x 10 s for the (B, 499, 4096) FFN activation dropout
(the only active dropout site in the Røst recipe, reference:
``config/model/wav2vec2-*.yaml`` ``activation_dropout``). Under rematerialised
backward the whole dance runs twice per layer.

This kernel seeds the TPU core PRNG per (row, tile) from a (B,) seed array
and generates the mask bits in VMEM, so HBM traffic is exactly read-x +
write-y. The backward pass re-seeds identically and applies the same mask to
the cotangent — the mask is never stored anywhere.

Drop decision: ``bits < round(rate * 2**32)`` on uint32 bits, i.e. the drop
probability is exact to 2**-32 (tighter than the float32-uniform comparison
inside ``jax.random.bernoulli``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

_TILE = 256  # rows per grid step; bits scratch stays ~4 MB at F=4096


def _dropout_kernel(seed_ref, x_ref, o_ref, *, threshold: int, scale: float):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(x_ref.shape)
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    x = x_ref[...]
    o_ref[...] = jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                           jnp.zeros_like(x))


def _dropout_pallas(x, seeds, rate: float, interpret: bool):
    B, T, F = x.shape
    threshold = int(round(rate * 2**32))
    scale = 1.0 / (1.0 - rate)
    grid = (B, pl.cdiv(T, _TILE))
    return pl.pallas_call(
        functools.partial(_dropout_kernel, threshold=threshold, scale=scale),
        grid=grid,
        in_specs=[
            # Whole seed vector in SMEM; the kernel indexes it by program id.
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _TILE, F), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TILE, F), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(seeds, x)


def _row_only(sharding, mesh, ndim):
    spec = [None] * ndim
    if isinstance(sharding, NamedSharding) and len(sharding.spec):
        spec[0] = sharding.spec[0]
    return NamedSharding(mesh, P(*spec))


@functools.lru_cache(maxsize=None)
def _dropout_cp(rate, interpret):
    f = custom_partitioning(
        lambda seeds, x: _dropout_pallas(x, seeds, rate, interpret)
    )

    def infer(mesh, arg_infos, result_infos):
        return _row_only(arg_infos[1].sharding, mesh, 3)

    def partition(mesh, arg_infos, result_infos):
        out_sh = _row_only(arg_infos[1].sharding, mesh, 3)
        seeds_sh = NamedSharding(mesh, P(out_sh.spec[0]))
        lower = lambda seeds, x: _dropout_pallas(x, seeds, rate, interpret)
        return mesh, lower, out_sh, (seeds_sh, out_sh)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b, b t f -> b t f",
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _dropout(x, seeds, rate, interpret):
    return _dropout_cp(rate, interpret)(seeds, x)


def _dropout_fwd(x, seeds, rate, interpret):
    return _dropout(x, seeds, rate, interpret), seeds


def _dropout_bwd(rate, interpret, seeds, dy):
    # Same seeds -> identical mask; dropout is linear in x.
    return _dropout_cp(rate, interpret)(seeds, dy), None


_dropout.defvjp(_dropout_fwd, _dropout_bwd)


def dropout(
    x: jnp.ndarray,
    rate: float,
    rng: jax.Array,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Apply inverted dropout with in-kernel mask generation.

    Args:
        x: (B, T, F) activations.
        rate: drop probability in [0, 1).
        rng: JAX PRNG key; folded into per-row seeds.
        interpret: run the Pallas interpreter (defaults to True off-TPU).

    Returns:
        ``x`` with elements dropped at ``rate`` and survivors scaled by
        ``1/(1-rate)``; same shape/dtype.
    """
    if rate == 0.0:
        return x
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret:
        # The TPU PRNG primitives have no interpreter lowering; off-TPU use
        # plain JAX dropout (same semantics, different mask stream).
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype),
                         jnp.zeros_like(x))
    B = x.shape[0]
    seeds = jax.random.bits(rng, (B,), jnp.uint32).astype(jnp.int32)
    return _dropout(x, seeds, float(rate), interpret)
