"""Microbenchmark: per-step cost of the GELU minimax polynomials inside a
matmul kernel body, by coefficient count.

Mimics the fused FFN forward: (256, 1024) @ (1024, 4096) matmul + a
poly epilogue over the (256, 4096) fp32 block. Compares no epilogue,
7 / 9 / 13 / 17 coefficients, and 13+17 (the block backward's
gelu-parts + dgelu pair), plus the dropout PRNG mask.

Run on the TPU host:  python tools/probe_gelu_cost.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 256
D = 1024
F = 4096
STEPS = 256


def _poly(x, n):
    xc = jnp.clip(x, -5.0, 5.0)
    t = 0.08 * (xc * xc) - 1.0
    acc = jnp.full_like(t, 1.0e-3)
    for i in range(n - 1):
        acc = acc * t + 1.0e-3 * (i + 2)
    return 0.5 + xc * acc


def _kernel(seed_ref, x_ref, w_ref, o_ref, *, polys: tuple, prng: bool):
    acc = jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if prng:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.prng_random_bits(acc.shape)
        keep = bits.astype(jnp.uint32) >= jnp.uint32(1 << 28)
        acc = jnp.where(keep, acc, 0.0)
    for n in polys:
        acc = acc * _poly(acc, n)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("polys", "prng"))
def run(seed, x, w, polys, prng):
    return pl.pallas_call(
        functools.partial(_kernel, polys=polys, prng=prng),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TB, D), lambda t: (t, 0, 0)),
            pl.BlockSpec((D, F), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TB, F), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((STEPS, TB, F), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(seed, x, w)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (STEPS, TB, D), jnp.bfloat16)
    w = jax.random.normal(key, (D, F), jnp.bfloat16) * 0.02
    seed = jnp.zeros((1,), jnp.int32)
    cases = [
        ("matmul only", (), False),
        ("poly13", (13,), False),
        ("poly13+17 (block bwd pair)", (13, 17), False),
        ("poly7+9 (short pair)", (7, 9), False),
        ("prng only", (), True),
    ]
    base = None
    for name, polys, prng in cases:
        out = run(seed, x, w, polys, prng)
        float(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(seed, x, w, polys, prng)
        float(out[0, 0, 0])
        dt = (time.perf_counter() - t0) / 5
        if base is None:
            base = dt
        print(f"{name:28s}: {dt * 1e3:8.2f} ms  (+{(dt - base) / STEPS * 1e6:6.2f} us/step over matmul)")


if __name__ == "__main__":
    main()
