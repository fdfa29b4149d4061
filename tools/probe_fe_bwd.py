"""Decompose the FE conv+LN+GELU backward kernel's cost on hardware.

The round-4/5 budget tables put the fused feature-encoder kernels at
~83.5 ms/step (~59% of the all-matmul floor), attributed to "VPU-epilogue
serialization" — but that attribution came from whole-step A/B probes
(_SPLIT, ATTN_PIPE), not from a per-phase decomposition. This probe times
the backward pallas call for the production layer-1 shape (the dominant FE
layer) against ablated kernel bodies:

  full        the production `_bwd_kernel`
  no_vpu      da := dy (skips dGELU + LN backward + dvec accumulation)
  no_dvec     keeps dGELU+LN bwd, skips the three dvec accumulators
  no_dw       skips the three dW accumulation matmuls
  no_dx       skips the three dx matmuls + interleave (writes da)
  no_inter    dx matmuls kept, interleave replaced by two half writes
  mm_only     matmuls only: da := dy, no mask, no dvec (the practical floor)

Each variant is a standalone pallas_call cloned from the production kernel
body (same grid/specs/scratch), so the deltas are attributable to the
removed phase alone. Results print as one JSON line per variant.

Usage:  python tools/probe_fe_bwd.py [--layer 1] [--batch 48] [--reps 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coral_tpu import _platform  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coral_tpu.ops import conv_ln_gelu_pallas as fe
from coral_tpu.ops.gelu_dropout_pallas import _dgelu

_TB = fe._TB


def _variant_kernel(x_ref, halo_ref, w_ref, g_ref, beta_ref, xhat_ref,
                    rstd_ref, dy_ref, dx_ref, dhalo_ref, dw_ref, dvec_ref,
                    dw_acc, dvec_acc, *, k: int, n_rows: int, eps: float,
                    mode: str):
    t = pl.program_id(1)
    t_last = pl.num_programs(1) - 1

    @pl.when(t == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        dvec_acc[...] = jnp.zeros_like(dvec_acc)

    gamma = g_ref[...].astype(jnp.float32)
    beta = beta_ref[...].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    row = t * dy.shape[0] + jax.lax.broadcasted_iota(jnp.int32, dy.shape, 0)
    mask = row < n_rows

    if mode in ("no_vpu", "mm_only"):
        da = jnp.where(mask, dy, 0.0) if mode == "no_vpu" else dy
        dab = da.astype(x_ref.dtype)
    else:
        xhat_s = jnp.where(mask, xhat_ref[0].astype(jnp.float32), 0.0)
        rstd_s = jnp.where(mask[:, :1], rstd_ref[0], 0.0)
        h = xhat_s * gamma + beta
        dh = jnp.where(mask, dy * _dgelu(h), 0.0)
        if mode != "no_dvec":
            dvec_acc[0, :] += jnp.sum(dh * xhat_s, axis=0)
            dvec_acc[1, :] += jnp.sum(dh, axis=0)
        dn = dh * gamma
        da = (
            dn
            - jnp.mean(dn, axis=-1, keepdims=True)
            - xhat_s * jnp.mean(dn * xhat_s, axis=-1, keepdims=True)
        ) * rstd_s
        if mode != "no_dvec":
            dvec_acc[2, :] += jnp.sum(da, axis=0)
        dab = da.astype(x_ref.dtype)

    mmT = lambda a, i: jax.lax.dot_general(  # noqa: E731
        a, w_ref[i], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if mode == "no_dx":
        dx_ref[0, :dab.shape[0]] = dab
        dhalo_ref[0, 0] = dab[-1:].astype(dhalo_ref.dtype)
    else:
        d_even = mmT(dab, 0)
        d_odd = mmT(dab, 1)
        if k == 3:
            dw2 = mmT(dab, 2)
            d_even = d_even + jnp.concatenate(
                [jnp.zeros_like(dw2[:1]), dw2[:-1]], axis=0
            )
            dhalo_ref[0, 0] = dw2[-1:].astype(dhalo_ref.dtype)
        if mode == "no_inter":
            n = d_even.shape[0]
            dx_ref[0, :n] = d_even.astype(dx_ref.dtype)
            dx_ref[0, n:] = d_odd.astype(dx_ref.dtype)
        else:
            dx_ref[0] = fe._interleave(
                d_even.astype(dx_ref.dtype), d_odd.astype(dx_ref.dtype)
            )

    if mode != "no_dw":
        even, odd = fe._deinterleave(x_ref[0])
        if k == 3:
            even_next = jnp.concatenate([even[1:], halo_ref[0, :1]], axis=0)
            if mode != "mm_only":
                even_next = jnp.where(mask, even_next, 0)
        if mode != "mm_only":
            even = jnp.where(mask, even, 0)
            odd = jnp.where(mask, odd, 0)
        otT = lambda a, b: jax.lax.dot_general(  # noqa: E731
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_acc[0] += otT(even, dab)
        dw_acc[1] += otT(odd, dab)
        if k == 3:
            dw_acc[2] += otT(even_next, dab)

    @pl.when(t == t_last)
    def _():
        dw_ref[0] = dw_acc[...]
        dvec_ref[0] = dvec_acc[...]


def _bwd_variant(x, w, gamma, beta, xhat, rstd, dy, k, eps, mode):
    B, T_in, C = x.shape
    T_out = xhat.shape[1]
    nT, x_spec, halo_spec, w_spec, vec_spec, out_spec, rstd_spec = (
        fe._grid_specs(B, T_out, C, k)
    )
    dx_spec = pl.BlockSpec((1, 2 * _TB, C), lambda b, t: (b, t, 0))
    dhalo_spec = pl.BlockSpec((1, 1, 1, C), lambda b, t: (b, t, 0, 0))
    dw_spec = pl.BlockSpec((1, k, C, C), lambda b, t: (b, 0, 0, 0))
    dvec_spec = pl.BlockSpec((1, 3, C), lambda b, t: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _variant_kernel, k=k, n_rows=T_out, eps=eps, mode=mode
        ),
        grid=(B, nT),
        in_specs=[x_spec, halo_spec, w_spec, vec_spec, vec_spec, out_spec,
                  rstd_spec, out_spec],
        out_specs=[dx_spec, dhalo_spec, dw_spec, dvec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_in, C), x.dtype),
            jax.ShapeDtypeStruct((B, nT, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, k, C, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, C, C), jnp.float32),
            pltpu.VMEM((3, C), jnp.float32),
        ],
        compiler_params=fe._COMPILER_PARAMS,
    )(x, x, w, gamma, beta, xhat, rstd, dy)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--layer", type=int, default=1,
                   help="FE layer index (1-4: k=3, 5-6: k=2)")
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    # Production FE shape chain at 16 kHz: layer 0 (k=10, s=5) then k=3/2.
    T = int(args.seconds * 16000)
    T = (T - 10) // 5 + 1
    ks = [3, 3, 3, 3, 2, 2]
    for i in range(args.layer - 1):
        T = (T - ks[i]) // 2 + 1
    k = ks[args.layer - 1]
    C = 512
    B = args.batch
    T_out = (T - k) // 2 + 1

    rng = np.random.default_rng(0)
    f = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s) * 0.05, jnp.bfloat16
    )
    x = f(B, T, C)
    dy = f(B, T_out, C)
    xhat = f(B, T_out, C)
    rstd = jnp.abs(jnp.asarray(rng.standard_normal((B, T_out, 1)), jnp.float32))
    w = f(k, C, C)
    gamma = f(C)
    beta = f(C)

    # All-matmul floor for this layer's backward (6 or 4 matmuls of
    # T_out x C x C), at the v5e bf16 peak.
    n_mm = 2 * k
    flop = 2.0 * n_mm * B * T_out * C * C
    floor_ms = flop / 197e12 * 1e3

    results = {}
    for mode in ("full", "no_vpu", "no_dvec", "no_dw", "no_dx", "no_inter",
                 "mm_only"):
        fn = jax.jit(
            functools.partial(
                _bwd_variant, k=k, eps=1e-5, mode=mode
            )
        )
        # Sync via host transfer of a small output — block_until_ready does
        # not flush through the axon tunnel (bench.py uses the same trick).
        out = fn(x, w, gamma, beta, xhat, rstd, dy)
        np.asarray(out[3])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(x, w, gamma, beta, xhat, rstd, dy)
        np.asarray(out[3])
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        results[mode] = round(ms, 3)
        print(json.dumps({
            "mode": mode, "ms": round(ms, 3),
            "layer": args.layer, "batch": B,
            "floor_ms": round(floor_ms, 3),
            "pct_of_floor": round(100 * floor_ms / ms, 1),
        }), flush=True)

    full = results["full"]
    print(json.dumps({
        "summary": {
            "floor_ms": round(floor_ms, 3),
            "full_ms": full,
            "vpu_epilogue_ms": round(full - results["no_vpu"], 3),
            "dvec_ms": round(full - results["no_dvec"], 3),
            "dw_ms": round(full - results["no_dw"], 3),
            "dx_ms": round(full - results["no_dx"], 3),
            "interleave_ms": round(full - results["no_inter"], 3),
            "mm_only_ms": results["mm_only"],
        }
    }), flush=True)


if __name__ == "__main__":
    main()
