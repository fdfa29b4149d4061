"""Microbenchmark: VPU cross-lane row reductions vs MXU ones-matmul sums.

The round-4 profile shows the FE conv and FFN block kernels at 59-82% of
their matmul flop floors with the gap attributed to serialized VPU phases
(Mosaic does not dual-issue VPU work under MXU streams). A large share of
that VPU phase is cross-lane row reductions (LayerNorm mu/var, LN-backward
means). This probe times a Pallas kernel body that mimics the LN forward
(2 row stats) and LN backward (2 row means) with the reductions done
(a) as jnp.mean over the lane axis (the shipped kernels' pattern) and
(b) as an MXU matmul with a ones matrix, slicing column 0.

Run on the TPU host:  python tools/probe_lane_reduce.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TB = 256
D = 1024
STEPS = 2048  # grid steps per call


def _mu_var_vpu(acc):
    mu = jnp.mean(acc, axis=-1, keepdims=True)
    cen = acc - mu
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    return cen, var


def _mu_var_mxu(acc, ones):
    s = jax.lax.dot_general(
        acc, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mu = s[:, :1] * (1.0 / acc.shape[-1])
    cen = acc - mu
    s2 = jax.lax.dot_general(
        cen * cen, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    var = s2[:, :1] * (1.0 / acc.shape[-1])
    return cen, var


def _kernel(x_ref, w_ref, ones_ref, o_ref, *, mode: str, nred: int):
    x = x_ref[0]
    # One matmul per step so the probe has an MXU stream to hide behind.
    acc = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for _ in range(nred):
        if mode == "vpu":
            cen, var = _mu_var_vpu(acc)
        else:
            cen, var = _mu_var_mxu(acc, ones_ref[...])
        acc = cen * jax.lax.rsqrt(var + 1e-5)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "nred"))
def run(x, w, ones, mode, nred):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode, nred=nred),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((1, TB, D), lambda t: (t, 0, 0)),
            pl.BlockSpec((D, D), lambda t: (0, 0)),
            pl.BlockSpec((D, 128), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TB, D), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((STEPS, TB, D), jnp.bfloat16),
    )(x, w, ones)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (STEPS, TB, D), jnp.bfloat16)
    w = jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02
    ones = jnp.ones((D, 128), jnp.bfloat16)
    for nred in (1, 2, 4):
        for mode in ("vpu", "mxu"):
            out = run(x, w, ones, mode, nred)
            float(out[0, 0, 0])  # axon: host fetch is the only reliable sync
            t0 = time.perf_counter()
            for _ in range(5):
                out = run(x, w, ones, mode, nred)
            float(out[0, 0, 0])
            dt = (time.perf_counter() - t0) / 5
            print(f"nred={nred} mode={mode}: {dt * 1e3:8.2f} ms "
                  f"({dt / STEPS * 1e6:6.2f} us/step)")


if __name__ == "__main__":
    main()
