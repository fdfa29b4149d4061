"""Fused FFN up-projection: matmul + bias + exact GELU (+ dropout) epilogue.

The wav2vec2/whisper FFN computes ``dropout(gelu(x @ W1 + b1))`` where the
4x-wide pre-activation ``h`` (131 MB at B=32 x 10 s, 196 MB at B=48) is the
largest tensor in the train step. Even with the fused GELU+dropout kernel
(``ops/gelu_dropout_pallas.py``) the step pays h's HBM round-trips five
times: fc1 writes h and the activation kernel re-reads it, in the forward,
in the remat replay, and once more in the backward. Reference surface:
HF ``Wav2Vec2FeedForward`` (``src/coral/wav2vec2.py:104-126`` configures the
model whose FFN this is).

This kernel folds the activation into the matmul's epilogue so ``h`` only
ever exists as a (TM, F) fp32 block in VMEM:

- forward: grid over (batch, TM-row blocks); each step runs one full-width
  (TM, D) @ (D, F) MXU matmul (W1 resident in VMEM across the whole grid),
  adds the bias, applies the clamped-minimax exact GELU and the in-VMEM
  PRNG dropout mask, and writes only the activation ``g``.
- backward: recomputes the same (TM, F) block of ``h`` on-MXU from (x, W1),
  re-seeds the identical mask stream, forms ``dh = dy * mask/keep *
  gelu'(h)``, and — while dh is still in VMEM — folds in ``dx = dh @ W1^T``
  and the bias-grad row accumulation, so only the dW1 matmul re-reads dh
  from HBM. The only residuals are x (the remat-named ``ffn_in`` tensor)
  and the (B,) seed vector.

vs. the split fc1 + gelu_dropout path this removes h's write + 2 reads per
pass (and the matmul's output relayout); the backward trades one extra fc1
matmul recompute for the h read — MXU time the traffic saving more than
covers at B>=32 (measured on the round-3 runbook).

Off-TPU the public entry composes plain XLA ops (exact same math for
rate=0; dropout uses ``jax.random`` — a different but equally-distributed
mask stream, like the other PRNG kernels). The rate=0 kernels carry no PRNG
and are additionally exercised under ``interpret=True`` in the CPU suite.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from .gelu_dropout_pallas import _dgelu, _gelu_parts, gelu_poly

# Rows per grid step. 256 keeps the fp32 h block at 4 MB (F=4096) and the
# per-step matmul (256, 1024) @ (1024, 4096) large enough to run the MXU at
# full tilt; env-overridable for tools/bench_config.py sweeps.
_TM = int(os.environ.get("CORAL_FFN_TM", "256"))
# W1 (8 MB bf16 at 1024x4096) + the fp32 h block push past the 16 MB scoped
# default; physical v5e VMEM is 128 MB.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _epilogue(acc, b_ref):
    h = acc + b_ref[...].astype(jnp.float32)
    g, _ = _gelu_parts(h)
    return g, h


def _matmul(x_ref, w_ref):
    return jax.lax.dot_general(
        x_ref[0], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ln_rows(x, gamma_ref, beta_ref, eps):
    """fp32 row LayerNorm; returns (ln_out fp32, xhat, rstd)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    cen = x - mu
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = cen * rstd
    ln = xhat * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(
        jnp.float32
    )
    return ln, xhat, rstd


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref):
    g, _ = _epilogue(_matmul(x_ref, w_ref), b_ref)
    o_ref[0] = g.astype(o_ref.dtype)


def _fwd_kernel_drop(seed_ref, x_ref, w_ref, b_ref, o_ref, *,
                     threshold: int, scale: float):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(o_ref.shape[1:])
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    g, _ = _epilogue(_matmul(x_ref, w_ref), b_ref)
    o_ref[0] = jnp.where(keep, g * scale, 0.0).astype(o_ref.dtype)


def _bwd_epilogue(dh, w_ref, dh_ref, dx_ref, db_ref, db_acc, *, n_rows: int):
    """Shared backward tail: write dh, fold dx = dh @ W^T and the bias-grad
    row accumulation into the same pass (dh never re-read from HBM for
    them; only dW still reads it outside)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        db_acc[...] = jnp.zeros_like(db_acc)

    # Rows past n_rows in the ragged last block hold pad data (out-of-bounds
    # block reads are unspecified on real TPUs); dh/dx writes are clipped,
    # but the db accumulator must see true zeros.
    row = t * dh.shape[0] + jax.lax.broadcasted_iota(jnp.int32, dh.shape, 0)
    dh = jnp.where(row < n_rows, dh, 0.0)
    dhb = dh.astype(dh_ref.dtype)
    dh_ref[0] = dhb
    dx_ref[0] = jax.lax.dot_general(
        dhb, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    db_acc[...] += jnp.sum(dh, axis=0, keepdims=True)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        db_ref[0] = db_acc[...]


def _bwd_kernel(x_ref, w_ref, b_ref, dy_ref, dh_ref, dx_ref, db_ref,
                db_acc, *, n_rows: int):
    _, h = _epilogue(_matmul(x_ref, w_ref), b_ref)
    dy = dy_ref[0].astype(jnp.float32)
    _bwd_epilogue(dy * _dgelu(h), w_ref, dh_ref, dx_ref, db_ref, db_acc,
                  n_rows=n_rows)


def _bwd_kernel_drop(seed_ref, x_ref, w_ref, b_ref, dy_ref, dh_ref, dx_ref,
                     db_ref, db_acc, *, threshold: int, scale: float,
                     n_rows: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(dh_ref.shape[1:])
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    _, h = _epilogue(_matmul(x_ref, w_ref), b_ref)
    dy = dy_ref[0].astype(jnp.float32)
    dh = jnp.where(keep, dy * scale * _dgelu(h), 0.0)
    _bwd_epilogue(dh, w_ref, dh_ref, dx_ref, db_ref, db_acc, n_rows=n_rows)


def _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps):
    ln, xhat, rstd = _ln_rows(x_ref[0], g_ref, bt_ref, eps)
    ln_b = ln.astype(x_ref.dtype)  # bf16 matmul operand, fwd == bwd exactly
    acc = jax.lax.dot_general(
        ln_b, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return acc, ln_b, xhat, rstd


def _fwd_kernel_ln(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *, eps: float):
    acc, _, _, _ = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, _ = _epilogue(acc, b_ref)
    o_ref[0] = g.astype(o_ref.dtype)


def _fwd_kernel_ln_drop(seed_ref, x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref,
                        *, threshold: int, scale: float, eps: float):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(o_ref.shape[1:])
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    acc, _, _, _ = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, _ = _epilogue(acc, b_ref)
    o_ref[0] = jnp.where(keep, g * scale, 0.0).astype(o_ref.dtype)


def _bwd_ln_epilogue(dh, ln_b, xhat, rstd, w_ref, g_ref,
                     dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, *, n_rows: int):
    """LN-fused backward tail: write dh and ln_out (the dW1 operand), fold
    dx (through the LayerNorm), and accumulate db/dgamma/dbeta rows."""
    t = pl.program_id(1)
    t_last = pl.num_programs(1) - 1

    @pl.when(t == 0)
    def _():
        db_acc[...] = jnp.zeros_like(db_acc)
        dvec_acc[...] = jnp.zeros_like(dvec_acc)

    def block(dh, xhat, masked: bool):
        # Ragged LAST block: pad rows hold unspecified data; dh/dx/ln
        # writes are clipped, but everything feeding the accumulators must
        # be true zeros (0 * NaN would poison them), including xhat from
        # NaN pad input. Interior blocks are complete by construction and
        # skip the masking passes (the (TM, F) wheres are pure VPU cost).
        if masked:
            row = t * dh.shape[0] + jax.lax.broadcasted_iota(
                jnp.int32, (dh.shape[0], 1), 0
            )
            mask = row < n_rows  # (TM, 1), broadcasts over F and D
            dh = jnp.where(mask, dh, 0.0)
            xhat = jnp.where(mask, xhat, 0.0)
        dhb = dh.astype(dh_ref.dtype)
        dh_ref[0] = dhb
        ln_ref[0] = ln_b
        db_acc[...] += jnp.sum(dh, axis=0, keepdims=True)

        # d(ln_out), then the LayerNorm backward — all row-local.
        dl = jax.lax.dot_general(
            dhb, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dvec_acc[0, :] += jnp.sum(dl * xhat, axis=0)  # dgamma
        dvec_acc[1, :] += jnp.sum(dl, axis=0)         # dbeta
        dn = dl * g_ref[...].astype(jnp.float32)
        dx = (
            dn
            - jnp.mean(dn, axis=-1, keepdims=True)
            - xhat * jnp.mean(dn * xhat, axis=-1, keepdims=True)
        ) * rstd
        dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(t < t_last)
    def _():
        block(dh, xhat, masked=False)

    @pl.when(t == t_last)
    def _():
        block(dh, xhat, masked=True)
        db_ref[0] = db_acc[...]
        dvec_ref[0] = dvec_acc[...]


def _bwd_kernel_ln(x_ref, w_ref, b_ref, g_ref, bt_ref, dy_ref,
                   dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                   db_acc, dvec_acc, *, eps: float, n_rows: int):
    acc, ln_b, xhat, rstd = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    _, h = _epilogue(acc, b_ref)
    dy = dy_ref[0].astype(jnp.float32)
    _bwd_ln_epilogue(dy * _dgelu(h), ln_b, xhat, rstd, w_ref, g_ref,
                     dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, n_rows=n_rows)


def _bwd_kernel_ln_g(x_ref, w_ref, b_ref, g_ref, bt_ref, dy_ref,
                     dh_ref, gout_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, *, eps: float, n_rows: int):
    """LN backward that additionally emits the post-activation ``g`` (the
    fc2/dW2 operand) — the block VJP's replacement for a forward replay."""
    acc, ln_b, xhat, rstd = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, h = _epilogue(acc, b_ref)
    gout_ref[0] = g.astype(gout_ref.dtype)
    dy = dy_ref[0].astype(jnp.float32)
    _bwd_ln_epilogue(dy * _dgelu(h), ln_b, xhat, rstd, w_ref, g_ref,
                     dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, n_rows=n_rows)


def _bwd_kernel_ln_g_drop(seed_ref, x_ref, w_ref, b_ref, g_ref, bt_ref,
                          dy_ref, dh_ref, gout_ref, dx_ref, ln_ref, db_ref,
                          dvec_ref, db_acc, dvec_acc, *, threshold: int,
                          scale: float, eps: float, n_rows: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(dh_ref.shape[1:])
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    acc, ln_b, xhat, rstd = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, h = _epilogue(acc, b_ref)
    gout_ref[0] = jnp.where(keep, g * scale, 0.0).astype(gout_ref.dtype)
    dy = dy_ref[0].astype(jnp.float32)
    dh = jnp.where(keep, dy * scale * _dgelu(h), 0.0)
    _bwd_ln_epilogue(dh, ln_b, xhat, rstd, w_ref, g_ref,
                     dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, n_rows=n_rows)


def _bwd_kernel_ln_dw(x_ref, w_ref, b_ref, g_ref, bt_ref, dy_ref, dg_ref,
                      dx_ref, dw1_ref, dw2_ref, db_ref, dvec_ref,
                      db_acc, dvec_acc, *, threshold: int, scale: float,
                      eps: float, n_rows: int, seed_ref=None):
    """Block backward with IN-KERNEL dW accumulation: dW1 and dW2 build up
    in fp32 VMEM-resident output blocks across the whole grid (the
    ``ref += dot`` pattern lowers to native MXU accumulation, like the FE
    conv kernel's dw scratch), so g / dh / ln_out never leave VMEM at all —
    the block VJP's remaining 4x-wide HBM round-trips disappear. Four
    matmuls per block: h recompute, dl = dh @ W1^T, dW1 += ln^T dh,
    dW2 += g^T dy; the dg = dy @ W2^T matmul stays outside (its operands
    are already in HBM)."""
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, t == 0))
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    @pl.when(t == 0)
    def _():
        db_acc[...] = jnp.zeros_like(db_acc)
        dvec_acc[...] = jnp.zeros_like(dvec_acc)

    acc, ln_b, xhat, rstd = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    gact, h = _epilogue(acc, b_ref)
    dg = dg_ref[0].astype(jnp.float32)
    if threshold:
        pltpu.prng_seed(seed_ref[b], t)
        bits = pltpu.prng_random_bits(dg.shape)
        keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
        dh = jnp.where(keep, dg * scale * _dgelu(h), 0.0)
        gact = jnp.where(keep, gact * scale, 0.0)
    else:
        dh = dg * _dgelu(h)

    # Ragged last block: pad rows hold unspecified data. Everything feeding
    # an accumulator or an in-kernel dot must be true zeros on BOTH operand
    # sides (the MXU propagates 0 * NaN = NaN).
    row = t * dh.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (dh.shape[0], 1), 0
    )
    mask = row < n_rows
    dh = jnp.where(mask, dh, 0.0)
    xhat = jnp.where(mask, xhat, 0.0)
    ln_m = jnp.where(mask, ln_b.astype(jnp.float32), 0.0).astype(ln_b.dtype)
    g_m = jnp.where(mask, gact, 0.0).astype(x_ref.dtype)
    dy_m = jnp.where(
        mask, dy_ref[0].astype(jnp.float32), 0.0
    ).astype(x_ref.dtype)

    dhb = dh.astype(x_ref.dtype)
    db_acc[...] += jnp.sum(dh, axis=0, keepdims=True)

    dw1_ref[...] += jax.lax.dot_general(
        ln_m, dhb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2_ref[...] += jax.lax.dot_general(
        g_m, dy_m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    dl = jax.lax.dot_general(
        dhb, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dvec_acc[0, :] += jnp.sum(dl * xhat, axis=0)  # dgamma
    dvec_acc[1, :] += jnp.sum(dl, axis=0)         # dbeta
    dn = dl * g_ref[...].astype(jnp.float32)
    dx = (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - xhat * jnp.mean(dn * xhat, axis=-1, keepdims=True)
    ) * rstd
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        db_ref[0] = db_acc[...]
        dvec_ref[0] = dvec_acc[...]


def _bwd_kernel_ln_g_dg(x_ref, w_ref, b_ref, g_ref, bt_ref, dy_ref, w2_ref,
                        dh_ref, gout_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                        db_acc, dvec_acc, *, eps: float, n_rows: int):
    """_bwd_kernel_ln_g with the fc2 cotangent computed IN-KERNEL:
    dg = dy @ W2^T reads the 49 MB dy block instead of the 196 MB dg one
    (the block backward is partly DMA-bound; this removes dg's HBM write
    outside + its read here)."""
    acc, ln_b, xhat, rstd = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, h = _epilogue(acc, b_ref)
    gout_ref[0] = g.astype(gout_ref.dtype)
    dg = jax.lax.dot_general(
        dy_ref[0], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    _bwd_ln_epilogue(dg * _dgelu(h), ln_b, xhat, rstd, w_ref, g_ref,
                     dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, n_rows=n_rows)


def _bwd_kernel_ln_g_dg_drop(seed_ref, x_ref, w_ref, b_ref, g_ref, bt_ref,
                             dy_ref, w2_ref, dh_ref, gout_ref, dx_ref,
                             ln_ref, db_ref, dvec_ref, db_acc, dvec_acc, *,
                             threshold: int, scale: float, eps: float,
                             n_rows: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(dh_ref.shape[1:])
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    acc, ln_b, xhat, rstd = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, h = _epilogue(acc, b_ref)
    gout_ref[0] = jnp.where(keep, g * scale, 0.0).astype(gout_ref.dtype)
    dg = jax.lax.dot_general(
        dy_ref[0], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jnp.where(keep, dg * scale * _dgelu(h), 0.0)
    _bwd_ln_epilogue(dh, ln_b, xhat, rstd, w_ref, g_ref,
                     dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, n_rows=n_rows)


def _bwd_kernel_g(x_ref, w_ref, b_ref, dy_ref, dh_ref, gout_ref, dx_ref,
                  db_ref, db_acc, *, n_rows: int):
    """Plain (no-LN) backward that additionally emits ``g``."""
    g, h = _epilogue(_matmul(x_ref, w_ref), b_ref)
    gout_ref[0] = g.astype(gout_ref.dtype)
    dy = dy_ref[0].astype(jnp.float32)
    _bwd_epilogue(dy * _dgelu(h), w_ref, dh_ref, dx_ref, db_ref, db_acc,
                  n_rows=n_rows)


def _bwd_kernel_g_drop(seed_ref, x_ref, w_ref, b_ref, dy_ref, dh_ref,
                       gout_ref, dx_ref, db_ref, db_acc, *, threshold: int,
                       scale: float, n_rows: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(dh_ref.shape[1:])
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    g, h = _epilogue(_matmul(x_ref, w_ref), b_ref)
    gout_ref[0] = jnp.where(keep, g * scale, 0.0).astype(gout_ref.dtype)
    dy = dy_ref[0].astype(jnp.float32)
    dh = jnp.where(keep, dy * scale * _dgelu(h), 0.0)
    _bwd_epilogue(dh, w_ref, dh_ref, dx_ref, db_ref, db_acc, n_rows=n_rows)


def _bwd_kernel_ln_drop(seed_ref, x_ref, w_ref, b_ref, g_ref, bt_ref, dy_ref,
                        dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                        db_acc, dvec_acc, *, threshold: int, scale: float,
                        eps: float, n_rows: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    bits = pltpu.prng_random_bits(dh_ref.shape[1:])
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    acc, ln_b, xhat, rstd = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    _, h = _epilogue(acc, b_ref)
    dy = dy_ref[0].astype(jnp.float32)
    dh = jnp.where(keep, dy * scale * _dgelu(h), 0.0)
    _bwd_ln_epilogue(dh, ln_b, xhat, rstd, w_ref, g_ref,
                     dh_ref, dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, n_rows=n_rows)


def _fwd_kernel_ln_fc2(x_ref, w_ref, b_ref, g_ref, bt_ref, w2_ref, b2_ref,
                       y_ref, *, eps: float):
    """Whole-FFN forward in one kernel: LN + fc1 + GELU + fc2. The 4x-wide
    activation g exists only as a VMEM block — with the block VJP (whose
    backward recomputes g itself) it never touches HBM in the forward at
    all. The g -> bf16 cast before the fc2 matmul matches the composed
    path's rounding exactly (there g round-trips HBM in bf16)."""
    acc, _, _, _ = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, _ = _epilogue(acc, b_ref)
    y = jax.lax.dot_general(
        g.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _fwd_kernel_ln_fc2_drop(seed_ref, x_ref, w_ref, b_ref, g_ref, bt_ref,
                            w2_ref, b2_ref, y_ref, *, threshold: int,
                            scale: float, eps: float):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[b], t)
    acc, _, _, _ = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    g, _ = _epilogue(acc, b_ref)
    bits = pltpu.prng_random_bits(g.shape)
    keep = bits.astype(jnp.uint32) >= jnp.uint32(threshold)
    g = jnp.where(keep, g * scale, 0.0)
    y = jax.lax.dot_general(
        g.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _fwd_kernel_lnmm(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *,
                     eps: float):
    """LN + matmul + bias, no activation: the pre-attention LayerNorm folded
    into the packed QKV projection (``ln_dense``)."""
    acc, _, _, _ = _ln_matmul(x_ref, w_ref, g_ref, bt_ref, eps)
    o_ref[0] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel_lnmm(x_ref, w_ref, g_ref, bt_ref, dy_ref,
                     dx_ref, ln_ref, db_ref, dvec_ref,
                     db_acc, dvec_acc, *, eps: float, n_rows: int):
    """Backward of LN + matmul + bias. With no activation there is nothing to
    recompute on-MXU: dh == dy, so the kernel only rebuilds the LN row stats
    from x, emits ``ln_out`` once (the outside dW operand), folds
    dl = dy @ W^T through the LayerNorm backward into dx, and accumulates
    the db/dgamma/dbeta rows."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        db_acc[...] = jnp.zeros_like(db_acc)
        dvec_acc[...] = jnp.zeros_like(dvec_acc)

    ln, xhat, rstd = _ln_rows(x_ref[0], g_ref, bt_ref, eps)
    ln_b = ln.astype(x_ref.dtype)
    dy = dy_ref[0].astype(jnp.float32)
    # Ragged last block: pad rows hold unspecified data (see _bwd_ln_epilogue).
    row = t * dy.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (dy.shape[0], 1), 0
    )
    mask = row < n_rows
    dy = jnp.where(mask, dy, 0.0)
    xhat = jnp.where(mask, xhat, 0.0)
    ln_ref[0] = ln_b
    db_acc[...] += jnp.sum(dy, axis=0, keepdims=True)

    dl = jax.lax.dot_general(
        dy.astype(x_ref.dtype), w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dvec_acc[0, :] += jnp.sum(dl * xhat, axis=0)  # dgamma
    dvec_acc[1, :] += jnp.sum(dl, axis=0)         # dbeta
    dn = dl * g_ref[...].astype(jnp.float32)
    dx = (
        dn
        - jnp.mean(dn, axis=-1, keepdims=True)
        - xhat * jnp.mean(dn * xhat, axis=-1, keepdims=True)
    ) * rstd
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        db_ref[0] = db_acc[...]
        dvec_ref[0] = dvec_acc[...]


def _specs(D, F):
    x_spec = pl.BlockSpec((1, _TM, D), lambda b, t: (b, t, 0))
    w_spec = pl.BlockSpec((D, F), lambda b, t: (0, 0))
    b_spec = pl.BlockSpec((F,), lambda b, t: (0,))
    out_spec = pl.BlockSpec((1, _TM, F), lambda b, t: (b, t, 0))
    return x_spec, w_spec, b_spec, out_spec


def _fwd_pallas(x, w, b, seeds, rate, interpret):
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    in_specs = [x_spec, w_spec, b_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _fwd_kernel_drop, threshold=threshold, scale=scale
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b)
    else:
        kernel = _fwd_kernel
        args = (x, w, b)
    return pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, F), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)


def _bwd_pallas(x, w, b, dy, seeds, rate, interpret):
    """Returns (dh, dx, db_rows): dh for the outside dW matmul, dx and the
    per-batch bias-grad rows folded into the same kernel pass."""
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    in_specs = [x_spec, w_spec, b_spec, out_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _bwd_kernel_drop, threshold=threshold, scale=scale, n_rows=T
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b, dy)
    else:
        kernel = functools.partial(_bwd_kernel, n_rows=T)
        args = (x, w, b, dy)
    # db rows carry a singleton middle dim: Mosaic requires output blocks
    # whose last-two dims are (8, 128)-divisible or equal to the array dims,
    # so a (1, F) block over (B, F) fails (sublane 1 vs B) while (1, 1, F)
    # over (B, 1, F) is exempt; squeezed right below, so callers see (B, F).
    dh, dx, db = pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=[
            out_spec,
            x_spec,
            pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F), x.dtype),
            jax.ShapeDtypeStruct((B, T, D), x.dtype),
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, F), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)
    return dh, dx, jnp.squeeze(db, axis=1)


def _bwd_pallas_g(x, w, b, dy, seeds, rate, interpret):
    """Like ``_bwd_pallas`` but also emits ``g`` (the dW2 operand) so the
    block VJP never replays the forward: (dh, g, dx, db_rows)."""
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    in_specs = [x_spec, w_spec, b_spec, out_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _bwd_kernel_g_drop, threshold=threshold, scale=scale, n_rows=T
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b, dy)
    else:
        kernel = functools.partial(_bwd_kernel_g, n_rows=T)
        args = (x, w, b, dy)
    dh, g, dx, db = pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=[
            out_spec,
            out_spec,
            x_spec,
            # (1, 1, F) over (B, 1, F): see the Mosaic block-rule note in
            # _bwd_pallas.
            pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F), x.dtype),
            jax.ShapeDtypeStruct((B, T, F), x.dtype),
            jax.ShapeDtypeStruct((B, T, D), x.dtype),
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, F), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)
    return dh, g, dx, jnp.squeeze(db, axis=1)


def _bwd_pallas_ln_g(x, w, b, gamma, beta, dy, seeds, rate, eps, interpret):
    """Like ``_bwd_pallas_ln`` but also emits ``g``:
    (dh, g, dx, ln_out, db_rows, dvec_rows)."""
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    in_specs = [x_spec, w_spec, b_spec, d_spec, d_spec, out_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _bwd_kernel_ln_g_drop, threshold=threshold, scale=scale, eps=eps,
            n_rows=T,
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b, gamma, beta, dy)
    else:
        kernel = functools.partial(_bwd_kernel_ln_g, eps=eps, n_rows=T)
        args = (x, w, b, gamma, beta, dy)
    dh, g, dx, ln_out, db, dvec = pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=[
            out_spec,
            out_spec,
            x_spec,
            x_spec,
            # (1, 1, F) over (B, 1, F): see the Mosaic block-rule note in
            # _bwd_pallas.
            pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 2, D), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F), x.dtype),   # dh
            jax.ShapeDtypeStruct((B, T, F), x.dtype),   # g
            jax.ShapeDtypeStruct((B, T, D), x.dtype),   # dx
            jax.ShapeDtypeStruct((B, T, D), x.dtype),   # ln_out
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),  # db rows
            jax.ShapeDtypeStruct((B, 2, D), jnp.float32),  # dgamma/dbeta rows
        ],
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.VMEM((2, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)
    return dh, g, dx, ln_out, jnp.squeeze(db, axis=1), dvec


def _bwd_pallas_ln_g_dg(x, w, b, gamma, beta, dy, w2, seeds, rate, eps,
                        interpret):
    """Like ``_bwd_pallas_ln_g`` but with dg computed in-kernel from
    (dy, W2): (dh, g, dx, ln_out, db_rows, dvec_rows)."""
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    dy_spec = pl.BlockSpec((1, _TM, D), lambda b, t: (b, t, 0))
    w2_spec = pl.BlockSpec((F, D), lambda b, t: (0, 0))
    in_specs = [x_spec, w_spec, b_spec, d_spec, d_spec, dy_spec, w2_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _bwd_kernel_ln_g_dg_drop, threshold=threshold, scale=scale,
            eps=eps, n_rows=T,
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b, gamma, beta, dy, w2)
    else:
        kernel = functools.partial(_bwd_kernel_ln_g_dg, eps=eps, n_rows=T)
        args = (x, w, b, gamma, beta, dy, w2)
    dh, g, dx, ln_out, db, dvec = pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=[
            out_spec,
            out_spec,
            x_spec,
            x_spec,
            # (1, 1, F) over (B, 1, F): see the Mosaic block-rule note in
            # _bwd_pallas.
            pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 2, D), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F), x.dtype),   # dh
            jax.ShapeDtypeStruct((B, T, F), x.dtype),   # g
            jax.ShapeDtypeStruct((B, T, D), x.dtype),   # dx
            jax.ShapeDtypeStruct((B, T, D), x.dtype),   # ln_out
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),  # db rows
            jax.ShapeDtypeStruct((B, 2, D), jnp.float32),  # dgamma/dbeta rows
        ],
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.VMEM((2, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)
    return dh, g, dx, ln_out, jnp.squeeze(db, axis=1), dvec


def _bwd_pallas_ln_dw(x, w, b, gamma, beta, dy, dg, seeds, rate, eps,
                      interpret):
    """Block backward with in-kernel dW accumulation:
    (dx, dw1, dw2, db_rows, dvec_rows); dw1/dw2 are whole fp32 arrays
    accumulated across the grid in VMEM-resident output blocks."""
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    dy_spec = pl.BlockSpec((1, _TM, D), lambda b, t: (b, t, 0))
    in_specs = [x_spec, w_spec, b_spec, d_spec, d_spec, dy_spec, out_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs

        def kernel(seed_ref, *refs):
            _bwd_kernel_ln_dw(*refs, threshold=threshold, scale=scale,
                              eps=eps, n_rows=T, seed_ref=seed_ref)

        args = (seeds, x, w, b, gamma, beta, dy, dg)
    else:
        kernel = functools.partial(_bwd_kernel_ln_dw, threshold=0,
                                   scale=1.0, eps=eps, n_rows=T)
        args = (x, w, b, gamma, beta, dy, dg)
    dx, dw1, dw2, db, dvec = pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=[
            x_spec,
            # Whole-array fp32 accumulators with constant index maps: the
            # blocks stay VMEM-resident across the grid and flush once.
            pl.BlockSpec((D, F), lambda b, t: (0, 0)),
            pl.BlockSpec((F, D), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 2, D), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), x.dtype),      # dx
            jax.ShapeDtypeStruct((D, F), jnp.float32),     # dW1
            jax.ShapeDtypeStruct((F, D), jnp.float32),     # dW2
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),  # db rows
            jax.ShapeDtypeStruct((B, 2, D), jnp.float32),  # dgamma/dbeta rows
        ],
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.VMEM((2, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)
    return dx, dw1, dw2, jnp.squeeze(db, axis=1), dvec


def _fwd_pallas_ln(x, w, b, gamma, beta, seeds, rate, eps, interpret):
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    in_specs = [x_spec, w_spec, b_spec, d_spec, d_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _fwd_kernel_ln_drop, threshold=threshold, scale=scale, eps=eps
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b, gamma, beta)
    else:
        kernel = functools.partial(_fwd_kernel_ln, eps=eps)
        args = (x, w, b, gamma, beta)
    return pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, F), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)


def _bwd_pallas_ln(x, w, b, gamma, beta, dy, seeds, rate, eps, interpret):
    """Returns (dh, dx, ln_out, db_rows, dvec_rows): ln_out feeds the
    outside dW1 matmul; dvec_rows stacks per-batch (dgamma, dbeta)."""
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    in_specs = [x_spec, w_spec, b_spec, d_spec, d_spec, out_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _bwd_kernel_ln_drop, threshold=threshold, scale=scale, eps=eps,
            n_rows=T,
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b, gamma, beta, dy)
    else:
        kernel = functools.partial(_bwd_kernel_ln, eps=eps, n_rows=T)
        args = (x, w, b, gamma, beta, dy)
    dh, dx, ln_out, db, dvec = pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=[
            out_spec,
            x_spec,
            x_spec,
            # (1, 1, F) over (B, 1, F): see the same note in _bwd_pallas —
            # a (1, F) block over (B, F) fails Mosaic's block rule. The
            # (1, 2, D) dvec block is exempt already (2 equals its array dim).
            pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 2, D), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, F), x.dtype),   # dh
            jax.ShapeDtypeStruct((B, T, D), x.dtype),   # dx
            jax.ShapeDtypeStruct((B, T, D), x.dtype),   # ln_out
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),  # db rows
            jax.ShapeDtypeStruct((B, 2, D), jnp.float32),  # dgamma/dbeta rows
        ],
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.VMEM((2, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)
    return dh, dx, ln_out, jnp.squeeze(db, axis=1), dvec


def _fwd_pallas_ln_fc2(x, w, b, gamma, beta, w2, b2, seeds, rate, eps,
                       interpret):
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, _ = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    w2_spec = pl.BlockSpec((F, D), lambda b, t: (0, 0))
    y_spec = pl.BlockSpec((1, _TM, D), lambda b, t: (b, t, 0))
    in_specs = [x_spec, w_spec, b_spec, d_spec, d_spec, w2_spec, d_spec]
    if rate > 0.0:
        threshold = int(round(rate * 2**32))
        scale = 1.0 / (1.0 - rate)
        kernel = functools.partial(
            _fwd_kernel_ln_fc2_drop, threshold=threshold, scale=scale,
            eps=eps,
        )
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (seeds, x, w, b, gamma, beta, w2, b2)
    else:
        kernel = functools.partial(_fwd_kernel_ln_fc2, eps=eps)
        args = (x, w, b, gamma, beta, w2, b2)
    return pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=in_specs,
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*args)


@functools.lru_cache(maxsize=None)
def _fwd_ln_fc2_cp(rate, eps, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, g, bt, w2, b2: _fwd_pallas_ln_fc2(  # noqa: E731
            x, w, b, g, bt, w2, b2, seeds, rate, eps, interpret
        )
        rule = "b, b t d, d f, f, d, d, f e, e -> b t e"
    else:
        fn = lambda x, w, b, g, bt, w2, b2: _fwd_pallas_ln_fc2(  # noqa: E731
            x, w, b, g, bt, w2, b2, None, rate, eps, interpret
        )
        rule = "b t d, d f, f, d, d, f e, e -> b t e"
    f = custom_partitioning(fn)

    def args_xw(arg_infos):
        return (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )

    def infer(mesh, arg_infos, result_infos):
        batch = _spec_dim(args_xw(arg_infos)[0].sharding, 0)
        return NamedSharding(mesh, P(batch, None, None))

    def partition(mesh, arg_infos, result_infos):
        xi, wi = args_xw(arg_infos)
        batch = _spec_dim(xi.sharding, 0)
        col = _spec_dim(wi.sharding, 1)
        out_sh = NamedSharding(mesh, P(batch, None, None))
        arg_sh = _shardings(mesh, xi, wi, with_seeds)[1]
        rep_d = NamedSharding(mesh, P(None))
        w2_sh = NamedSharding(mesh, P(col, None))

        def lower(*a):
            if col is None:
                return fn(*a)
            # Column-sharded W1 / row-sharded W2 (TP): each shard's fc2
            # contracts only its local F slice — y is a partial sum, and b2
            # must be added once AFTER the psum (not once per shard).
            *head, b2 = a
            y = fn(*head, jnp.zeros_like(b2))
            y = jax.lax.psum(y, col)
            return (y.astype(jnp.float32) + b2.astype(jnp.float32)).astype(
                y.dtype
            )

        return mesh, lower, out_sh, arg_sh + (rep_d, rep_d, w2_sh, rep_d)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


def _fwd_pallas_lnmm(x, w, b, gamma, beta, eps, interpret):
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, b_spec, out_spec = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    return pl.pallas_call(
        functools.partial(_fwd_kernel_lnmm, eps=eps),
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=[x_spec, w_spec, b_spec, d_spec, d_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, F), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(x, w, b, gamma, beta)


def _bwd_pallas_lnmm(x, w, gamma, beta, dy, eps, interpret):
    """Returns (dx, ln_out, db_rows, dvec_rows); dW runs outside as
    ``ln_out^T @ dy`` (dy is already in HBM — no dh copy to emit)."""
    B, T, D = x.shape
    F = w.shape[1]
    x_spec, w_spec, _, out_spec = _specs(D, F)
    d_spec = pl.BlockSpec((D,), lambda b, t: (0,))
    dx, ln_out, db, dvec = pl.pallas_call(
        functools.partial(_bwd_kernel_lnmm, eps=eps, n_rows=T),
        grid=(B, pl.cdiv(T, _TM)),
        in_specs=[x_spec, w_spec, d_spec, d_spec, out_spec],
        out_specs=[
            x_spec,
            x_spec,
            # (1, 1, F) over (B, 1, F): see the Mosaic block-rule note in
            # _bwd_pallas.
            pl.BlockSpec((1, 1, F), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 2, D), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, D), x.dtype),      # dx
            jax.ShapeDtypeStruct((B, T, D), x.dtype),      # ln_out
            jax.ShapeDtypeStruct((B, 1, F), jnp.float32),  # db rows
            jax.ShapeDtypeStruct((B, 2, D), jnp.float32),  # dgamma/dbeta rows
        ],
        scratch_shapes=[
            pltpu.VMEM((1, F), jnp.float32),
            pltpu.VMEM((2, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(x, w, gamma, beta, dy)
    return dx, ln_out, jnp.squeeze(db, axis=1), dvec


# ---------------------------------------------------------------------------
# custom_partitioning: batch dim follows x, F dim follows W1's column
# sharding (tensor-parallel fc1 is column-sharded, parallel/tp.py:39-41);
# each shard runs the kernel on its local F slice. The mask stream is a
# function of (per-batch seed, row-block), so column shards of the same rows
# draw identical bits — same documented delta as the split kernel.
# ---------------------------------------------------------------------------


def _spec_dim(sharding, dim):
    if isinstance(sharding, NamedSharding) and len(sharding.spec) > dim:
        return sharding.spec[dim]
    return None


def _shardings(mesh, x_info, w_info, with_seeds):
    batch = _spec_dim(x_info.sharding, 0)
    col = _spec_dim(w_info.sharding, 1)
    out_sh = NamedSharding(mesh, P(batch, None, col))
    x_sh = NamedSharding(mesh, P(batch, None, None))
    w_sh = NamedSharding(mesh, P(None, col))
    b_sh = NamedSharding(mesh, P(col))
    arg_sh = (x_sh, w_sh, b_sh)
    if with_seeds:
        arg_sh = (NamedSharding(mesh, P(batch)),) + arg_sh
    return out_sh, arg_sh


@functools.lru_cache(maxsize=None)
def _fwd_cp(rate, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b: _fwd_pallas(  # noqa: E731
            x, w, b, seeds, rate, interpret
        )
        rule = "b, b t d, d f, f -> b t f"
    else:
        fn = lambda x, w, b: _fwd_pallas(  # noqa: E731
            x, w, b, None, rate, interpret
        )
        rule = "b t d, d f, f -> b t f"
    f = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        xi, wi = (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )
        return _shardings(mesh, xi, wi, with_seeds)[0]

    def partition(mesh, arg_infos, result_infos):
        xi, wi = (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )
        out_sh, arg_sh = _shardings(mesh, xi, wi, with_seeds)
        return mesh, fn, out_sh, arg_sh

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


def _bwd_shardings(mesh, x_info, w_info):
    batch = _spec_dim(x_info.sharding, 0)
    col = _spec_dim(w_info.sharding, 1)
    return (
        NamedSharding(mesh, P(batch, None, col)),   # dh
        NamedSharding(mesh, P(batch, None, None)),  # dx
        NamedSharding(mesh, P(batch, col)),         # db_rows
    )


@functools.lru_cache(maxsize=None)
def _bwd_cp(rate, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, dy: _bwd_pallas(  # noqa: E731
            x, w, b, dy, seeds, rate, interpret
        )
        rule = "b, b t d, d f, f, b t f -> b t f, b t d, b f"
    else:
        fn = lambda x, w, b, dy: _bwd_pallas(  # noqa: E731
            x, w, b, dy, None, rate, interpret
        )
        rule = "b t d, d f, f, b t f -> b t f, b t d, b f"
    f = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        xi, wi = (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )
        return _bwd_shardings(mesh, xi, wi)

    def partition(mesh, arg_infos, result_infos):
        xi, wi = (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )
        out_sh = _bwd_shardings(mesh, xi, wi)
        arg_sh = _shardings(mesh, xi, wi, with_seeds)[1]
        col = _spec_dim(wi.sharding, 1)

        def lower(*a):
            dh, dx, db_rows = fn(*a)
            if col is not None:
                # Column-sharded W1 (tensor parallel): each shard's in-kernel
                # dx = dh @ W^T contracts only its local F slice.
                dx = jax.lax.psum(dx, col)
            return dh, dx, db_rows

        return mesh, lower, out_sh, arg_sh + (out_sh[0],)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


@functools.lru_cache(maxsize=None)
def _fwd_ln_cp(rate, eps, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, g, bt: _fwd_pallas_ln(  # noqa: E731
            x, w, b, g, bt, seeds, rate, eps, interpret
        )
        rule = "b, b t d, d f, f, d, d -> b t f"
    else:
        fn = lambda x, w, b, g, bt: _fwd_pallas_ln(  # noqa: E731
            x, w, b, g, bt, None, rate, eps, interpret
        )
        rule = "b t d, d f, f, d, d -> b t f"
    f = custom_partitioning(fn)

    def args_xw(arg_infos):
        return (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, *args_xw(arg_infos), with_seeds)[0]

    def partition(mesh, arg_infos, result_infos):
        out_sh, arg_sh = _shardings(mesh, *args_xw(arg_infos), with_seeds)
        rep_d = NamedSharding(mesh, P(None))
        return mesh, fn, out_sh, arg_sh + (rep_d, rep_d)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


def _bwd_ln_shardings(mesh, x_info, w_info):
    batch = _spec_dim(x_info.sharding, 0)
    col = _spec_dim(w_info.sharding, 1)
    return (
        NamedSharding(mesh, P(batch, None, col)),    # dh
        NamedSharding(mesh, P(batch, None, None)),   # dx
        NamedSharding(mesh, P(batch, None, None)),   # ln_out
        NamedSharding(mesh, P(batch, col)),          # db rows
        NamedSharding(mesh, P(batch, None, None)),   # dgamma/dbeta rows
    )


@functools.lru_cache(maxsize=None)
def _bwd_ln_cp(rate, eps, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, g, bt, dy: _bwd_pallas_ln(  # noqa: E731
            x, w, b, g, bt, dy, seeds, rate, eps, interpret
        )
        rule = "b, b t d, d f, f, d, d, b t f -> b t f, b t d, b t d, b f, b v d"
    else:
        fn = lambda x, w, b, g, bt, dy: _bwd_pallas_ln(  # noqa: E731
            x, w, b, g, bt, dy, None, rate, eps, interpret
        )
        rule = "b t d, d f, f, d, d, b t f -> b t f, b t d, b t d, b f, b v d"
    f = custom_partitioning(fn)

    def args_xw(arg_infos):
        return (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )

    def infer(mesh, arg_infos, result_infos):
        return _bwd_ln_shardings(mesh, *args_xw(arg_infos))

    def partition(mesh, arg_infos, result_infos):
        xi, wi = args_xw(arg_infos)
        out_sh = _bwd_ln_shardings(mesh, xi, wi)
        arg_sh = _shardings(mesh, xi, wi, with_seeds)[1]
        rep_d = NamedSharding(mesh, P(None))
        col = _spec_dim(wi.sharding, 1)

        def lower(*a):
            dh, dx, ln_out, db_rows, dvec_rows = fn(*a)
            if col is not None:
                # Column-sharded W1 (TP): dl = dh @ W^T contracts only the
                # local F slice, so dx and dgamma/dbeta are partial sums.
                dx = jax.lax.psum(dx, col)
                dvec_rows = jax.lax.psum(dvec_rows, col)
            return dh, dx, ln_out, db_rows, dvec_rows

        return mesh, lower, out_sh, arg_sh + (rep_d, rep_d, out_sh[0])

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


def _bwd_g_shardings(mesh, x_info, w_info):
    batch = _spec_dim(x_info.sharding, 0)
    col = _spec_dim(w_info.sharding, 1)
    return (
        NamedSharding(mesh, P(batch, None, col)),   # dh
        NamedSharding(mesh, P(batch, None, col)),   # g
        NamedSharding(mesh, P(batch, None, None)),  # dx
        NamedSharding(mesh, P(batch, col)),         # db_rows
    )


@functools.lru_cache(maxsize=None)
def _bwd_g_cp(rate, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, dy: _bwd_pallas_g(  # noqa: E731
            x, w, b, dy, seeds, rate, interpret
        )
        rule = "b, b t d, d f, f, b t f -> b t f, b t f, b t d, b f"
    else:
        fn = lambda x, w, b, dy: _bwd_pallas_g(  # noqa: E731
            x, w, b, dy, None, rate, interpret
        )
        rule = "b t d, d f, f, b t f -> b t f, b t f, b t d, b f"
    f = custom_partitioning(fn)

    def args_xw(arg_infos):
        return (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )

    def infer(mesh, arg_infos, result_infos):
        return _bwd_g_shardings(mesh, *args_xw(arg_infos))

    def partition(mesh, arg_infos, result_infos):
        xi, wi = args_xw(arg_infos)
        out_sh = _bwd_g_shardings(mesh, xi, wi)
        arg_sh = _shardings(mesh, xi, wi, with_seeds)[1]
        col = _spec_dim(wi.sharding, 1)

        def lower(*a):
            dh, g, dx, db_rows = fn(*a)
            if col is not None:
                # Column-sharded W1 (TP): dx = dh @ W^T contracts only the
                # local F slice.
                dx = jax.lax.psum(dx, col)
            return dh, g, dx, db_rows

        return mesh, lower, out_sh, arg_sh + (out_sh[0],)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


def _bwd_ln_g_shardings(mesh, x_info, w_info):
    batch = _spec_dim(x_info.sharding, 0)
    col = _spec_dim(w_info.sharding, 1)
    return (
        NamedSharding(mesh, P(batch, None, col)),    # dh
        NamedSharding(mesh, P(batch, None, col)),    # g
        NamedSharding(mesh, P(batch, None, None)),   # dx
        NamedSharding(mesh, P(batch, None, None)),   # ln_out
        NamedSharding(mesh, P(batch, col)),          # db rows
        NamedSharding(mesh, P(batch, None, None)),   # dgamma/dbeta rows
    )


@functools.lru_cache(maxsize=None)
def _bwd_ln_g_cp(rate, eps, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, g, bt, dy: _bwd_pallas_ln_g(  # noqa: E731
            x, w, b, g, bt, dy, seeds, rate, eps, interpret
        )
        rule = ("b, b t d, d f, f, d, d, b t f -> "
                "b t f, b t f, b t d, b t d, b f, b v d")
    else:
        fn = lambda x, w, b, g, bt, dy: _bwd_pallas_ln_g(  # noqa: E731
            x, w, b, g, bt, dy, None, rate, eps, interpret
        )
        rule = ("b t d, d f, f, d, d, b t f -> "
                "b t f, b t f, b t d, b t d, b f, b v d")
    f = custom_partitioning(fn)

    def args_xw(arg_infos):
        return (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )

    def infer(mesh, arg_infos, result_infos):
        return _bwd_ln_g_shardings(mesh, *args_xw(arg_infos))

    def partition(mesh, arg_infos, result_infos):
        xi, wi = args_xw(arg_infos)
        out_sh = _bwd_ln_g_shardings(mesh, xi, wi)
        arg_sh = _shardings(mesh, xi, wi, with_seeds)[1]
        rep_d = NamedSharding(mesh, P(None))
        col = _spec_dim(wi.sharding, 1)

        def lower(*a):
            dh, g, dx, ln_out, db_rows, dvec_rows = fn(*a)
            if col is not None:
                # Column-sharded W1 (TP): dl = dh @ W^T contracts only the
                # local F slice, so dx and dgamma/dbeta are partial sums.
                dx = jax.lax.psum(dx, col)
                dvec_rows = jax.lax.psum(dvec_rows, col)
            return dh, g, dx, ln_out, db_rows, dvec_rows

        return mesh, lower, out_sh, arg_sh + (rep_d, rep_d, out_sh[0])

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_ln_g_dg_cp(rate, eps, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, g, bt, dy, w2: _bwd_pallas_ln_g_dg(  # noqa: E731
            x, w, b, g, bt, dy, w2, seeds, rate, eps, interpret
        )
        rule = ("b, b t d, d f, f, d, d, b t d, f e -> "
                "b t f, b t f, b t d, b t d, b f, b v d")
    else:
        fn = lambda x, w, b, g, bt, dy, w2: _bwd_pallas_ln_g_dg(  # noqa: E731
            x, w, b, g, bt, dy, w2, None, rate, eps, interpret
        )
        rule = ("b t d, d f, f, d, d, b t d, f e -> "
                "b t f, b t f, b t d, b t d, b f, b v d")
    f = custom_partitioning(fn)

    def args_xw(arg_infos):
        return (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )

    def infer(mesh, arg_infos, result_infos):
        return _bwd_ln_g_shardings(mesh, *args_xw(arg_infos))

    def partition(mesh, arg_infos, result_infos):
        xi, wi = args_xw(arg_infos)
        out_sh = _bwd_ln_g_shardings(mesh, xi, wi)
        arg_sh = _shardings(mesh, xi, wi, with_seeds)[1]
        rep_d = NamedSharding(mesh, P(None))
        batch = _spec_dim(xi.sharding, 0)
        col = _spec_dim(wi.sharding, 1)
        dy_sh = NamedSharding(mesh, P(batch, None, None))
        w2_sh = NamedSharding(mesh, P(col, None))

        def lower(*a):
            dh, g, dx, ln_out, db_rows, dvec_rows = fn(*a)
            if col is not None:
                # Column-sharded W1 (TP): dl = dh @ W1^T contracts only the
                # local F slice, so dx and dgamma/dbeta are partial sums.
                # (dg's own contraction is over the unsharded D.)
                dx = jax.lax.psum(dx, col)
                dvec_rows = jax.lax.psum(dvec_rows, col)
            return dh, g, dx, ln_out, db_rows, dvec_rows

        return mesh, lower, out_sh, arg_sh + (rep_d, rep_d, dy_sh, w2_sh)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


def _bwd_ln_dw_shardings(mesh, x_info, w_info):
    batch = _spec_dim(x_info.sharding, 0)
    col = _spec_dim(w_info.sharding, 1)
    return (
        NamedSharding(mesh, P(batch, None, None)),   # dx
        NamedSharding(mesh, P(None, col)),           # dW1 (col-sharded F)
        NamedSharding(mesh, P(col, None)),           # dW2 (row-sharded F)
        NamedSharding(mesh, P(batch, col)),          # db rows
        NamedSharding(mesh, P(batch, None, None)),   # dgamma/dbeta rows
    )


@functools.lru_cache(maxsize=None)
def _bwd_ln_dw_cp(rate, eps, interpret, with_seeds):
    if with_seeds:
        fn = lambda seeds, x, w, b, g, bt, dy, dg: _bwd_pallas_ln_dw(  # noqa: E731
            x, w, b, g, bt, dy, dg, seeds, rate, eps, interpret
        )
        rule = ("b, b t d, d f, f, d, d, b t d, b t f -> "
                "b t d, d f, f d, b f, b v d")
    else:
        fn = lambda x, w, b, g, bt, dy, dg: _bwd_pallas_ln_dw(  # noqa: E731
            x, w, b, g, bt, dy, dg, None, rate, eps, interpret
        )
        rule = ("b t d, d f, f, d, d, b t d, b t f -> "
                "b t d, d f, f d, b f, b v d")
    f = custom_partitioning(fn)

    def args_xw(arg_infos):
        return (arg_infos[1], arg_infos[2]) if with_seeds else (
            arg_infos[0], arg_infos[1]
        )

    def infer(mesh, arg_infos, result_infos):
        return _bwd_ln_dw_shardings(mesh, *args_xw(arg_infos))

    def partition(mesh, arg_infos, result_infos):
        xi, wi = args_xw(arg_infos)
        out_sh = _bwd_ln_dw_shardings(mesh, xi, wi)
        arg_sh = _shardings(mesh, xi, wi, with_seeds)[1]
        rep_d = NamedSharding(mesh, P(None))
        batch = _spec_dim(xi.sharding, 0)
        col = _spec_dim(wi.sharding, 1)
        dy_sh = NamedSharding(mesh, P(batch, None, None))
        dg_sh = NamedSharding(mesh, P(batch, None, col))

        def lower(*a):
            dx, dw1, dw2, db_rows, dvec_rows = fn(*a)
            if batch is not None:
                # The kernel accumulates its dW over the LOCAL batch shard;
                # GSPMD cannot see into the custom call, so reduce here.
                dw1 = jax.lax.psum(dw1, batch)
                dw2 = jax.lax.psum(dw2, batch)
            if col is not None:
                # Column-sharded W1 (TP): dl = dh @ W^T contracts only the
                # local F slice, so dx and dgamma/dbeta are partial sums.
                dx = jax.lax.psum(dx, col)
                dvec_rows = jax.lax.psum(dvec_rows, col)
            return dx, dw1, dw2, db_rows, dvec_rows

        return mesh, lower, out_sh, arg_sh + (rep_d, rep_d, dy_sh, dg_sh)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return f


@functools.lru_cache(maxsize=None)
def _fwd_lnmm_cp(eps, interpret):
    fn = lambda x, w, b, g, bt: _fwd_pallas_lnmm(  # noqa: E731
        x, w, b, g, bt, eps, interpret
    )
    f = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos[0], arg_infos[1], False)[0]

    def partition(mesh, arg_infos, result_infos):
        out_sh, arg_sh = _shardings(mesh, arg_infos[0], arg_infos[1], False)
        rep_d = NamedSharding(mesh, P(None))
        return mesh, fn, out_sh, arg_sh + (rep_d, rep_d)

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t d, d f, f, d, d -> b t f",
    )
    return f


def _bwd_lnmm_shardings(mesh, x_info, w_info):
    batch = _spec_dim(x_info.sharding, 0)
    col = _spec_dim(w_info.sharding, 1)
    return (
        NamedSharding(mesh, P(batch, None, None)),   # dx
        NamedSharding(mesh, P(batch, None, None)),   # ln_out
        NamedSharding(mesh, P(batch, col)),          # db rows
        NamedSharding(mesh, P(batch, None, None)),   # dgamma/dbeta rows
    )


@functools.lru_cache(maxsize=None)
def _bwd_lnmm_cp(eps, interpret):
    fn = lambda x, w, g, bt, dy: _bwd_pallas_lnmm(  # noqa: E731
        x, w, g, bt, dy, eps, interpret
    )
    f = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        return _bwd_lnmm_shardings(mesh, arg_infos[0], arg_infos[1])

    def partition(mesh, arg_infos, result_infos):
        xi, wi = arg_infos[0], arg_infos[1]
        out_sh = _bwd_lnmm_shardings(mesh, xi, wi)
        batch = _spec_dim(xi.sharding, 0)
        col = _spec_dim(wi.sharding, 1)
        rep_d = NamedSharding(mesh, P(None))
        arg_sh = (
            NamedSharding(mesh, P(batch, None, None)),
            NamedSharding(mesh, P(None, col)),
            rep_d, rep_d,
            NamedSharding(mesh, P(batch, None, col)),
        )

        def lower(*a):
            dx, ln_out, db_rows, dvec_rows = fn(*a)
            if col is not None:
                # Column-sharded W (TP): dl = dy @ W^T contracts only the
                # local F slice, so dx and dgamma/dbeta are partial sums.
                dx = jax.lax.psum(dx, col)
                dvec_rows = jax.lax.psum(dvec_rows, col)
            return dx, ln_out, db_rows, dvec_rows

        return mesh, lower, out_sh, arg_sh

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t d, d f, d, d, b t f -> b t d, b t d, b f, b v d",
    )
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_dense(x, w, b, gamma, beta, eps, interpret):
    return _fwd_lnmm_cp(eps, interpret)(x, w, b, gamma, beta)


def _ln_dense_fwd(x, w, b, gamma, beta, eps, interpret):
    y = _ln_dense(x, w, b, gamma, beta, eps, interpret)
    return y, (x, w, gamma, beta)


def _ln_dense_bwd(eps, interpret, res, dy):
    x, w, gamma, beta = res
    dx, ln_out, db_rows, dvec_rows = _bwd_lnmm_cp(eps, interpret)(
        x, w, gamma, beta, dy
    )
    # dW reads dy directly (it is already in HBM — no dh copy to emit).
    # Batch reductions stay plain jnp so GSPMD inserts the cross-shard psums.
    dw = jax.lax.dot_general(
        ln_out, dy, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = jnp.sum(db_rows, axis=0)
    dvec = jnp.sum(dvec_rows, axis=0)
    return dx, dw, db, dvec[0].astype(gamma.dtype), dvec[1].astype(beta.dtype)


_ln_dense.defvjp(_ln_dense_fwd, _ln_dense_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _ffn_ln_fc1(x, w, b, gamma, beta, seeds, rate, eps, interpret):
    if rate > 0.0:
        return _fwd_ln_cp(rate, eps, interpret, True)(
            seeds, x, w, b, gamma, beta
        )
    return _fwd_ln_cp(rate, eps, interpret, False)(x, w, b, gamma, beta)


def _ffn_ln_fc1_fwd(x, w, b, gamma, beta, seeds, rate, eps, interpret):
    y = _ffn_ln_fc1(x, w, b, gamma, beta, seeds, rate, eps, interpret)
    return y, (x, w, b, gamma, beta, seeds)


def _ffn_ln_fc1_bwd(rate, eps, interpret, res, dy):
    x, w, b, gamma, beta, seeds = res
    if rate > 0.0:
        dh, dx, ln_out, db_rows, dvec_rows = _bwd_ln_cp(
            rate, eps, interpret, True
        )(seeds, x, w, b, gamma, beta, dy)
    else:
        dh, dx, ln_out, db_rows, dvec_rows = _bwd_ln_cp(
            rate, eps, interpret, False
        )(x, w, b, gamma, beta, dy)
    # Only dW1 reads dh (and the kernel-emitted ln_out) from HBM; everything
    # else came out of the fused pass. Batch reductions stay plain jnp so
    # GSPMD inserts the cross-shard psums.
    dw = jax.lax.dot_general(
        ln_out, dh, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = jnp.sum(db_rows, axis=0)
    dvec = jnp.sum(dvec_rows, axis=0)
    return dx, dw, db, dvec[0].astype(gamma.dtype), dvec[1].astype(
        beta.dtype
    ), None


_ffn_ln_fc1.defvjp(_ffn_ln_fc1_fwd, _ffn_ln_fc1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ffn_fc1(x, w, b, seeds, rate, interpret):
    if rate > 0.0:
        return _fwd_cp(rate, interpret, True)(seeds, x, w, b)
    return _fwd_cp(rate, interpret, False)(x, w, b)


def _ffn_fc1_fwd(x, w, b, seeds, rate, interpret):
    return _ffn_fc1(x, w, b, seeds, rate, interpret), (x, w, b, seeds)


def _ffn_fc1_bwd(rate, interpret, res, dy):
    x, w, b, seeds = res
    if rate > 0.0:
        dh, dx, db_rows = _bwd_cp(rate, interpret, True)(seeds, x, w, b, dy)
    else:
        dh, dx, db_rows = _bwd_cp(rate, interpret, False)(x, w, b, dy)
    # dx and the bias-grad rows come out of the kernel itself (dh reused in
    # VMEM); only dW still reads dh, as a plain XLA matmul. Under a sharded
    # batch GSPMD inserts the cross-shard psum on dw/db; under TP the column
    # shards each own their dW1 slice (dh is column-sharded to match).
    dw = jax.lax.dot_general(
        x, dh, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = jnp.sum(db_rows, axis=0)
    return dx, dw, db, None


_ffn_fc1.defvjp(_ffn_fc1_fwd, _ffn_fc1_bwd)


def _fc2(g, w2, b2):
    y = jax.lax.dot_general(
        g, w2.astype(g.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return y.astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _ffn_ln_block(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                  interpret):
    if rate > 0.0:
        g = _fwd_ln_cp(rate, eps, interpret, True)(
            seeds, x, w1, b1, gamma, beta
        )
    else:
        g = _fwd_ln_cp(rate, eps, interpret, False)(x, w1, b1, gamma, beta)
    return _fc2(g, w2, b2)


def _ffn_ln_block_fwd(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                      interpret):
    y = _ffn_ln_block(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                      interpret)
    # Residuals are primal inputs only: under any remat policy the backward
    # needs no value from the block's forward, so the replay DCEs the whole
    # FFN (the bwd kernel recomputes h AND g on-MXU from x in one pass).
    return y, (x, w1, b1, gamma, beta, w2, seeds)


def _ffn_ln_block_bwd(rate, eps, interpret, res, dy):
    x, w1, b1, gamma, beta, w2, seeds = res
    # dg = dy @ W2^T — plain XLA matmul (GSPMD shards it; under TP the
    # row-sharded W2 makes dg column-sharded, matching the kernel's layout).
    dg = jax.lax.dot_general(
        dy, w2.astype(dy.dtype), (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dy.dtype)
    if rate > 0.0:
        dh, g, dx, ln_out, db1_rows, dvec_rows = _bwd_ln_g_cp(
            rate, eps, interpret, True
        )(seeds, x, w1, b1, gamma, beta, dg)
    else:
        dh, g, dx, ln_out, db1_rows, dvec_rows = _bwd_ln_g_cp(
            rate, eps, interpret, False
        )(x, w1, b1, gamma, beta, dg)
    # Batch reductions stay plain jnp so GSPMD inserts cross-shard psums.
    dw1 = jax.lax.dot_general(
        ln_out, dh, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w1.dtype)
    db1 = jnp.sum(db1_rows, axis=0)
    dvec = jnp.sum(dvec_rows, axis=0)
    dw2 = jax.lax.dot_general(
        g, dy, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w2.dtype)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
    return (dx, dw1, db1, dvec[0].astype(gamma.dtype),
            dvec[1].astype(beta.dtype), dw2, db2, None)


_ffn_ln_block.defvjp(_ffn_ln_block_fwd, _ffn_ln_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _ffn_ln_block_dg(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                     interpret):
    """The block with the fc2 cotangent (dg = dy @ W2^T) computed inside
    the backward kernel — same forward as _ffn_ln_block."""
    if rate > 0.0:
        g = _fwd_ln_cp(rate, eps, interpret, True)(
            seeds, x, w1, b1, gamma, beta
        )
    else:
        g = _fwd_ln_cp(rate, eps, interpret, False)(x, w1, b1, gamma, beta)
    return _fc2(g, w2, b2)


def _ffn_ln_block_dg_fwd(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                         interpret):
    y = _ffn_ln_block_dg(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                         interpret)
    return y, (x, w1, b1, gamma, beta, w2, seeds)


def _ffn_ln_block_dg_bwd(rate, eps, interpret, res, dy):
    x, w1, b1, gamma, beta, w2, seeds = res
    dyb = dy.astype(x.dtype)
    if rate > 0.0:
        dh, g, dx, ln_out, db1_rows, dvec_rows = _bwd_ln_g_dg_cp(
            rate, eps, interpret, True
        )(seeds, x, w1, b1, gamma, beta, dyb, w2.astype(x.dtype))
    else:
        dh, g, dx, ln_out, db1_rows, dvec_rows = _bwd_ln_g_dg_cp(
            rate, eps, interpret, False
        )(x, w1, b1, gamma, beta, dyb, w2.astype(x.dtype))
    dw1 = jax.lax.dot_general(
        ln_out, dh, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w1.dtype)
    db1 = jnp.sum(db1_rows, axis=0)
    dvec = jnp.sum(dvec_rows, axis=0)
    dw2 = jax.lax.dot_general(
        g, dy, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w2.dtype)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
    return (dx, dw1, db1, dvec[0].astype(gamma.dtype),
            dvec[1].astype(beta.dtype), dw2, db2, None)


_ffn_ln_block_dg.defvjp(_ffn_ln_block_dg_fwd, _ffn_ln_block_dg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _ffn_ln_block_fc2(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                      interpret):
    """The block with fc2 folded into the FORWARD kernel too (g never
    touches HBM in the forward); backward identical to _ffn_ln_block."""
    if rate > 0.0:
        return _fwd_ln_fc2_cp(rate, eps, interpret, True)(
            seeds, x, w1, b1, gamma, beta, w2, b2
        )
    return _fwd_ln_fc2_cp(rate, eps, interpret, False)(
        x, w1, b1, gamma, beta, w2, b2
    )


def _ffn_ln_block_fc2_fwd(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                          interpret):
    y = _ffn_ln_block_fc2(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                          interpret)
    return y, (x, w1, b1, gamma, beta, w2, seeds)


_ffn_ln_block_fc2.defvjp(_ffn_ln_block_fc2_fwd, _ffn_ln_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _ffn_ln_block_dw(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                     interpret):
    if rate > 0.0:
        g = _fwd_ln_cp(rate, eps, interpret, True)(
            seeds, x, w1, b1, gamma, beta
        )
    else:
        g = _fwd_ln_cp(rate, eps, interpret, False)(x, w1, b1, gamma, beta)
    return _fc2(g, w2, b2)


def _ffn_ln_block_dw_fwd(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                         interpret):
    y = _ffn_ln_block_dw(x, w1, b1, gamma, beta, w2, b2, seeds, rate, eps,
                         interpret)
    return y, (x, w1, b1, gamma, beta, w2, seeds)


def _ffn_ln_block_dw_bwd(rate, eps, interpret, res, dy):
    x, w1, b1, gamma, beta, w2, seeds = res
    # dg = dy @ W2^T stays a plain XLA matmul (both operands already live in
    # HBM); everything downstream of it — h/g recompute, dh, dW1, dW2, dx,
    # db1, dgamma/dbeta — runs in ONE kernel with the dW products
    # accumulated on-MXU into VMEM-resident fp32 blocks, so no 4x-wide
    # tensor ever returns to HBM.
    dg = jax.lax.dot_general(
        dy, w2.astype(dy.dtype), (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dy.dtype)
    if rate > 0.0:
        dx, dw1, dw2, db1_rows, dvec_rows = _bwd_ln_dw_cp(
            rate, eps, interpret, True
        )(seeds, x, w1, b1, gamma, beta, dy, dg)
    else:
        dx, dw1, dw2, db1_rows, dvec_rows = _bwd_ln_dw_cp(
            rate, eps, interpret, False
        )(x, w1, b1, gamma, beta, dy, dg)
    db1 = jnp.sum(db1_rows, axis=0)
    dvec = jnp.sum(dvec_rows, axis=0)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
    return (dx, dw1.astype(w1.dtype), db1, dvec[0].astype(gamma.dtype),
            dvec[1].astype(beta.dtype), dw2.astype(w2.dtype), db2, None)


_ffn_ln_block_dw.defvjp(_ffn_ln_block_dw_fwd, _ffn_ln_block_dw_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _ffn_block(x, w1, b1, w2, b2, seeds, rate, interpret):
    if rate > 0.0:
        g = _fwd_cp(rate, interpret, True)(seeds, x, w1, b1)
    else:
        g = _fwd_cp(rate, interpret, False)(x, w1, b1)
    return _fc2(g, w2, b2)


def _ffn_block_fwd(x, w1, b1, w2, b2, seeds, rate, interpret):
    y = _ffn_block(x, w1, b1, w2, b2, seeds, rate, interpret)
    return y, (x, w1, b1, w2, seeds)


def _ffn_block_bwd(rate, interpret, res, dy):
    x, w1, b1, w2, seeds = res
    dg = jax.lax.dot_general(
        dy, w2.astype(dy.dtype), (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dy.dtype)
    if rate > 0.0:
        dh, g, dx, db1_rows = _bwd_g_cp(rate, interpret, True)(
            seeds, x, w1, b1, dg
        )
    else:
        dh, g, dx, db1_rows = _bwd_g_cp(rate, interpret, False)(
            x, w1, b1, dg
        )
    dw1 = jax.lax.dot_general(
        x, dh, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w1.dtype)
    db1 = jnp.sum(db1_rows, axis=0)
    dw2 = jax.lax.dot_general(
        g, dy, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w2.dtype)
    db2 = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
    return dx, dw1, db1, dw2, db2, None


_ffn_block.defvjp(_ffn_block_fwd, _ffn_block_bwd)


def _xla_reference(x, w, b, rate, rng):
    h = jax.lax.dot_general(
        x, w.astype(x.dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    g = gelu_poly(h).astype(x.dtype)
    if rate == 0.0:
        return g
    keep = jax.random.bernoulli(rng, 1.0 - rate, g.shape)
    return jnp.where(keep, g / jnp.asarray(1.0 - rate, g.dtype),
                     jnp.zeros_like(g))


def _xla_ln(x, gamma, beta, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    cen = x32 - mu
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    ln = cen * jax.lax.rsqrt(var + eps) * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    return ln.astype(x.dtype)


def _xla_reference_ln(x, w, b, gamma, beta, rate, rng, eps):
    return _xla_reference(_xla_ln(x, gamma, beta, eps), w, b, rate, rng)


def ffn_fc1(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    rate: float = 0.0,
    rng: jax.Array | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``dropout(gelu(x @ w + b), rate)`` with the pre-activation VMEM-only.

    Args:
        x: (B, T, D) FFN input (the remat-named ``ffn_in`` tensor).
        w: (D, F) up-projection weight (column-sharded under TP).
        b: (F,) bias.
        rate: activation-dropout probability in [0, 1).
        rng: PRNG key, required when ``rate > 0``.
        interpret: run the Pallas interpreter off-TPU (rate=0 only; the
            PRNG variants have no interpreter path).

    Returns:
        (B, T, F) activations in ``x.dtype``.
    """
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    D, F = w.shape
    if (interpret and rate > 0.0) or D % 128 != 0 or F % 128 != 0:
        return _xla_reference(x, w, b, rate, rng)
    if rate > 0.0:
        seeds = jax.random.bits(rng, (x.shape[0],), jnp.uint32).astype(
            jnp.int32
        )
    else:
        seeds = jnp.zeros((x.shape[0],), jnp.int32)
    return _ffn_fc1(x, w.astype(x.dtype), b, seeds, float(rate), interpret)


def ln_dense(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``layer_norm(x) @ w + b`` in one fused kernel (no activation).

    Folds a single-consumer LayerNorm into the following projection — in the
    pre-LN transformer the pre-attention LN feeds only the packed QKV matmul
    (reference surface: HF ``Wav2Vec2EncoderLayerStableLayerNorm``,
    ``src/coral/wav2vec2.py:104-126`` configures the model). Removes the
    separate LN kernels and the normalised tensor's HBM round-trips; the
    backward rebuilds the row stats from x (no matmul recompute — there is
    no nonlinearity), emits ``ln_out`` once for the outside dW matmul, and
    computes the full LN backward (dx, dgamma, dbeta) in-register.

    Args:
        x: (B, T, D) pre-LN residual stream.
        w: (D, F) projection weight (column-sharded under TP; F = 3D for a
            packed QKV projection).
        b: (F,) bias.
        gamma, beta: (D,) LayerNorm affine parameters.
        eps: LayerNorm epsilon.
        interpret: run the Pallas interpreter off-TPU.

    Returns:
        (B, T, F) projections in ``x.dtype``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D, F = w.shape
    if D % 128 != 0 or F % 128 != 0:
        h = jax.lax.dot_general(
            _xla_ln(x, gamma, beta, eps), w.astype(x.dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + b.astype(jnp.float32)
        return h.astype(x.dtype)
    return _ln_dense(
        x, w.astype(x.dtype), b, gamma, beta, float(eps), interpret
    )


def ffn_ln_fc1(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    rate: float = 0.0,
    rng: jax.Array | None = None,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``dropout(gelu(layer_norm(x) @ w + b), rate)`` in one fused kernel.

    The pre-LN transformer's FFN LayerNorm has a single consumer, so folding
    it into the matmul kernel removes both the separate LN kernels and the
    normalised tensor's HBM round-trips; the backward emits ``ln_out`` once
    for the outside dW1 matmul and computes the full LN backward (dx,
    dgamma, dbeta) in-register.

    Args:
        x: (B, T, D) pre-LN residual stream.
        w: (D, F) up-projection weight (column-sharded under TP).
        b: (F,) bias.
        gamma, beta: (D,) LayerNorm affine parameters.
        rate: activation-dropout probability in [0, 1).
        rng: PRNG key, required when ``rate > 0``.
        eps: LayerNorm epsilon.
        interpret: run the Pallas interpreter off-TPU (rate=0 only).

    Returns:
        (B, T, F) activations in ``x.dtype``.
    """
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    D, F = w.shape
    if (interpret and rate > 0.0) or D % 128 != 0 or F % 128 != 0:
        return _xla_reference_ln(x, w, b, gamma, beta, rate, rng, eps)
    if rate > 0.0:
        seeds = jax.random.bits(rng, (x.shape[0],), jnp.uint32).astype(
            jnp.int32
        )
    else:
        seeds = jnp.zeros((x.shape[0],), jnp.int32)
    return _ffn_ln_fc1(
        x, w.astype(x.dtype), b, gamma, beta, seeds, float(rate), float(eps),
        interpret,
    )


def _block_seeds(x, rate, rng):
    if rate > 0.0:
        return jax.random.bits(rng, (x.shape[0],), jnp.uint32).astype(
            jnp.int32
        )
    return jnp.zeros((x.shape[0],), jnp.int32)


def ffn_ln_block(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    rate: float = 0.0,
    rng: jax.Array | None = None,
    eps: float = 1e-5,
    interpret: bool | None = None,
    dw_in_kernel: bool = False,
    fc2_in_kernel: bool = False,
    dg_in_kernel: bool = False,
) -> jnp.ndarray:
    """The whole pre-LN FFN as ONE differentiable block:
    ``dropout(gelu(layer_norm(x) @ w1 + b1), rate) @ w2 + b2``.

    vs. ``ffn_ln_fc1`` + a separate fc2 this removes the FFN's forward from
    the remat replay entirely: the block's VJP residuals are primal inputs
    only, and its backward kernel recomputes h on-MXU AND emits the
    post-activation ``g`` (the dW2 operand) in the same pass — so under
    ``nothing_saveable`` the 4x-wide activation is computed twice total
    (fwd, bwd) instead of three times (fwd, replay, bwd), and never feeds a
    separate replay kernel. 7 same-size matmuls per layer instead of 8.
    Reference surface: HF ``Wav2Vec2FeedForward``
    (``src/coral/wav2vec2.py:104-126`` configures the model).

    Args:
        x: (B, T, D) pre-LN residual stream (the remat-named ``ffn_in``).
        w1: (D, F) up-projection weight (column-sharded under TP).
        b1: (F,) bias.
        gamma, beta: (D,) LayerNorm affine parameters.
        w2: (F, D) down-projection weight (row-sharded under TP).
        b2: (D,) bias.
        rate: activation-dropout probability in [0, 1).
        rng: PRNG key, required when ``rate > 0``.
        eps: LayerNorm epsilon.
        interpret: run the Pallas interpreter off-TPU (rate=0 only).
        dw_in_kernel: accumulate dW1/dW2 on-MXU into VMEM-resident fp32
            blocks inside the backward kernel (4 in-kernel matmuls; only
            dg = dy @ W2^T stays outside) — g/dh/ln_out never return to
            HBM. False = emit them for outside XLA dW matmuls. (Measured
            slower on v5e: the 32 MB accumulators squeeze the pipeline.)
        fc2_in_kernel: fold fc2 into the FORWARD kernel too, so g never
            touches HBM in the forward (the backward recomputes it anyway
            and is unchanged). Identical rounding to the composed path.
            (Measured slower on v5e: the g round-trip overlaps DMA.)
        dg_in_kernel: compute dg = dy @ W2^T inside the backward kernel —
            it then reads the 49 MB/layer dy instead of the 196 MB dg, and
            the outside dg matmul (with its 196 MB write) disappears.

    Returns:
        (B, T, D) FFN output in ``x.dtype`` (residual add stays outside).
    """
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    D, F = w1.shape
    if (interpret and rate > 0.0) or D % 128 != 0 or F % 128 != 0:
        g = _xla_reference_ln(x, w1, b1, gamma, beta, rate, rng, eps)
        return _fc2(g, w2, b2)
    if dw_in_kernel:
        fn = _ffn_ln_block_dw
    elif fc2_in_kernel:
        fn = _ffn_ln_block_fc2
    elif dg_in_kernel:
        fn = _ffn_ln_block_dg
    else:
        fn = _ffn_ln_block
    return fn(
        x, w1.astype(x.dtype), b1, gamma, beta, w2.astype(x.dtype), b2,
        _block_seeds(x, rate, rng), float(rate), float(eps), interpret,
    )


def ffn_block(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    rate: float = 0.0,
    rng: jax.Array | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``dropout(gelu(x @ w1 + b1), rate) @ w2 + b2`` as one differentiable
    block — the no-LN variant of :func:`ffn_ln_block` (post-LN configs, or
    callers that normalise separately)."""
    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    D, F = w1.shape
    if (interpret and rate > 0.0) or D % 128 != 0 or F % 128 != 0:
        return _fc2(_xla_reference(x, w1, b1, rate, rng), w2, b2)
    return _ffn_block(
        x, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2,
        _block_seeds(x, rate, rng), float(rate), interpret,
    )
