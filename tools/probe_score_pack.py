"""Is the d=64 attention score matmul output-rate-bound on the MXU?

VERDICT r4 #2(a) asks for an actual factorisation attempt on the d=64
score/backward matmuls (measured at ~50% MXU): a 2-head-packed contraction
— block-diagonal (T, 128) x (128, 2T) — or head-pair lane packing so the
contraction runs on full 128-lane K.

The analytic model says packing cannot win: the systolic array streams one
128-wide output column tile per cycle regardless of contraction depth
K <= 128, so a (T, 64) x (64, T) score matmul costs the same cycles as
(T, 128) x (128, T) — the "50% MXU" is the FLOP/slot ratio of a K=64
contraction, not a recoverable inefficiency. Any packing that produces the
same T x T x H outputs needs the same column count:
  - block-diagonal (T, 128) x (128, 2T): N doubles, cost identical, and
    half the stationary operand is zeros;
  - head-pair sum/difference ([q1|q2] @ [k1|k2]^T = s1 + s2 and
    [q1|-q2] @ [k1|k2]^T = s1 - s2, recover s1/s2 by butterfly): two full
    K=128 matmuls for two heads — identical slot count again, plus the
    butterfly's VPU adds.

This probe measures all four factorisations on hardware to adjudicate the
model. If per-head K=64 is ~= the K=128 rate ceiling per output element,
the attention score matmuls are at their floor and the remaining backward
gap is scheduling/epilogue, not contraction width.

Run on the bench host: python tools/probe_score_pack.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    B, T, H, d = 8, 512, 16, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, d)), jnp.bfloat16)

    # 1. Per-head K=64 (the kernel's current factorisation, batched form).
    @jax.jit
    def per_head(q, k):
        return jnp.einsum(
            "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
        )

    # 2. Head-pair sum/difference: two K=128 matmuls per pair + butterfly.
    qp = q.reshape(B, H // 2, 2, T, d)
    kp = k.reshape(B, H // 2, 2, T, d)
    q2 = jnp.concatenate([qp[:, :, 0], qp[:, :, 1]], axis=-1)   # (B,H/2,T,128)
    q2m = jnp.concatenate([qp[:, :, 0], -qp[:, :, 1]], axis=-1)
    k2 = jnp.concatenate([kp[:, :, 0], kp[:, :, 1]], axis=-1)

    @jax.jit
    def sumdiff(q2, q2m, k2):
        a = jnp.einsum(
            "bptd,bpsd->bpts", q2, k2, preferred_element_type=jnp.float32
        )  # s1 + s2
        b = jnp.einsum(
            "bptd,bpsd->bpts", q2m, k2, preferred_element_type=jnp.float32
        )  # s1 - s2
        return 0.5 * (a + b), 0.5 * (a - b)

    # 3. Block-diagonal N-side packing: (T, 128) x (128, 2T) per pair.
    zeros = jnp.zeros((B, H // 2, T, d), jnp.bfloat16)
    kbd = jnp.concatenate(
        [
            jnp.concatenate([kp[:, :, 0], zeros], axis=-1),   # (B,H/2,T,128)
            jnp.concatenate([zeros, kp[:, :, 1]], axis=-1),
        ],
        axis=2,
    )  # (B, H/2, 2T, 128)

    @jax.jit
    def blockdiag(q2, kbd):
        return jnp.einsum(
            "bptd,bpsd->bpts", q2, kbd, preferred_element_type=jnp.float32
        )  # (B, H/2, T, 2T)

    # 4. The K=128 rate ceiling: same output count, full contraction.
    @jax.jit
    def k128(q2, k2):
        return jnp.einsum(
            "bptd,bpsd->bpts", q2, k2, preferred_element_type=jnp.float32
        )  # (B, H/2, T, T) — HALF the outputs of the others.

    ms_head = _time(per_head, q, k)
    ms_sd = _time(sumdiff, q2, q2m, k2)
    ms_bd = _time(blockdiag, q2, kbd)
    ms_k128 = _time(k128, q2, k2)

    outputs = B * H * T * T  # score elements produced (per full head set)
    print(json.dumps({
        "per_head_k64_ms": round(ms_head, 3),
        "sumdiff_k128_ms": round(ms_sd, 3),
        "blockdiag_ms": round(ms_bd, 3),
        "k128_half_outputs_ms": round(ms_k128, 3),
        # ns per score element; equal per-head vs k128x2 ==> output-bound.
        "per_head_ns_per_out": round(ms_head * 1e6 / outputs, 4),
        "k128_ns_per_out": round(ms_k128 * 2 * 1e6 / outputs, 4),
    }))


if __name__ == "__main__":
    main()
