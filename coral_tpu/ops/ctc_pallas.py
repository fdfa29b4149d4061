"""Pallas TPU kernels for the CTC alpha/beta recursions.

The reference's CTC loss is a CUDA kernel inside torch
(``torch.nn.functional.ctc_loss``; reference: ``src/coral/wav2vec2.py:120,125``).
The XLA fallback in ``coral_tpu.ops.ctc`` runs the time recursion as a
``lax.scan`` — correct, but each of the T iterations is a separate while-loop
step, and the per-iteration launch overhead dominates the (tiny) per-step
compute. These kernels run the ENTIRE recursion inside one Pallas program:

- grid = (num_batch_blocks, T / CHUNK_T); TPU grid steps execute sequentially
  over the minor axis, so a VMEM scratch buffer carries the alpha/beta state
  across the whole T dimension with zero HBM round-trips. Each program runs
  CHUNK_T recursion steps in an inner fori_loop, so per-program launch overhead
  is amortised ~100x compared to a lax.scan over single steps;
- the emission matrix ``emit[b, t, s] = log_probs[t, b, ext[b, s]]`` is
  precomputed with one XLA gather (MXU/VPU-friendly) and streamed block-wise;
- state shifts along the S lanes use ``pltpu.roll``; -inf is a large-negative
  float so the arithmetic stays NaN-free;
- the backward (beta) kernel is the same program with a time-reversed index
  map and the skip mask shifted the other way.

Shapes are padded to TPU tiles: S to a multiple of 128 lanes, the batch block
to 8 sublanes (float32 tiling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

BATCH_BLOCK = 8
CHUNK_T = 128  # max recursion steps per grid program


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_t(Sp: int) -> int:
    """Time-chunk size fitting the scoped-VMEM budget.

    Each grid program holds the emission and output blocks
    (chunk x BATCH_BLOCK x Sp f32), both double-buffered across grid steps;
    long label rows (S' = 2*512+1 padded to 1152 lanes) overflow the 16 MB
    scoped-VMEM limit at the full 128-step chunk, so the chunk shrinks to fit.
    """
    budget = 10 * 1024 * 1024
    per_step = 2 * 2 * BATCH_BLOCK * Sp * 4  # (emit + out) x double-buffer
    chunk = budget // per_step
    return max(8, min(CHUNK_T, (chunk // 8) * 8))


def _log_add(a, b):
    mx = jnp.maximum(a, b)
    mx_safe = jnp.maximum(mx, NEG_INF)
    return mx_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx_safe))


def _shift_right(x, k):
    """Shift lanes right by k (toward higher s), filling with NEG_INF."""
    S = x.shape[-1]
    rolled = pltpu.roll(x, k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane < k, NEG_INF, rolled)


def _shift_left(x, k):
    """Shift lanes left by k (toward lower s), filling with NEG_INF."""
    S = x.shape[-1]
    rolled = pltpu.roll(x, S - k, axis=1)  # roll must be non-negative
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    return jnp.where(lane >= S - k, NEG_INF, rolled)


def _alpha_kernel(
    emit_ref,        # (chunk_t, BB, S) emission block
    skip_ref,        # (BB, S) float {0,1}: s-2 -> s transition allowed
    valid_ref,       # (BB, S) float {0,1}: state within 2*label_len+1
    lengths_ref,     # (BB, 1) int32 input lengths
    out_ref,         # (chunk_t, BB, S) alphas
    state,           # VMEM scratch (BB, S) float32 — carried across chunks
    *,
    chunk_t: int,
):
    chunk = pl.program_id(1)
    valid = valid_ref[:, :] > 0.5
    skip = skip_ref[:, :] > 0.5
    lengths = lengths_ref[:, 0]

    def body(j, _):
        t = chunk * chunk_t + j
        emit = emit_ref[j, :, :]

        @pl.when(t == 0)
        def _():
            # alpha_0: states 0 and 1 start; everything else -inf.
            lane = jax.lax.broadcasted_iota(jnp.int32, emit.shape, dimension=1)
            init = jnp.where(lane <= 1, emit, NEG_INF)
            state[:, :] = jnp.where(valid, init, NEG_INF)

        @pl.when(t > 0)
        def _():
            alpha = state[:, :]
            prev1 = _shift_right(alpha, 1)
            prev2 = _shift_right(alpha, 2)
            summed = _log_add(alpha, prev1)
            summed = jnp.where(skip, _log_add(summed, prev2), summed)
            new_alpha = jnp.where(valid, summed + emit, NEG_INF)
            # Freeze once past each sample's length.
            active = t < lengths
            state[:, :] = jnp.where(active[:, None], new_alpha, alpha)

        out_ref[j, :, :] = state[:, :]
        return 0

    jax.lax.fori_loop(0, chunk_t, body, 0)


def _beta_kernel(
    emit_ref,        # (CHUNK_T, BB, S) emission block (time-reversed chunks)
    skip_ref,        # (BB, S) float {0,1}: s -> s+2 transition allowed
    valid_ref,       # (BB, S)
    lengths_ref,     # (BB, 1)
    last_state_ref,  # (BB, S) float {0,1}: terminal states
    out_ref,         # (chunk_t, BB, S)
    state,           # VMEM scratch (BB, S)
    *,
    chunk_t: int,
):
    num_chunks = pl.num_programs(1)
    rev = pl.program_id(1)
    chunk = num_chunks - 1 - rev  # actual time chunk
    valid = valid_ref[:, :] > 0.5
    skip = skip_ref[:, :] > 0.5
    lengths = lengths_ref[:, 0]
    terminal_mask = last_state_ref[:, :] > 0.5

    @pl.when(rev == 0)
    def _():
        state[:, :] = jnp.full((state.shape[0], state.shape[1]), NEG_INF,
                               dtype=jnp.float32)

    def body(i, _):
        j = chunk_t - 1 - i  # walk the chunk backwards in time
        t = chunk * chunk_t + j
        emit = emit_ref[j, :, :]

        beta = state[:, :]
        next1 = _shift_left(beta, 1)
        next2 = _shift_left(beta, 2)
        summed = _log_add(beta, next1)
        summed = jnp.where(skip, _log_add(summed, next2), summed)
        new_beta = summed + emit

        t_is_last = t == (lengths - 1)
        terminal = jnp.where(terminal_mask, emit, NEG_INF)
        new_beta = jnp.where(t_is_last[:, None], terminal, new_beta)
        new_beta = jnp.where(valid, new_beta, NEG_INF)
        started = t <= (lengths - 1)
        state[:, :] = jnp.where(started[:, None], new_beta, beta)
        out_ref[j, :, :] = state[:, :]
        return 0

    jax.lax.fori_loop(0, chunk_t, body, 0)


def _pad_inputs(emit, skip, valid, lengths, extra=None):
    """Pad B to the batch block, S to the 128-lane tile, T to the chunk."""
    T, B, S = emit.shape
    Bp = _round_up(B, BATCH_BLOCK)
    Sp = _round_up(S, 128)
    Tp = _round_up(T, _chunk_t(Sp))
    emit = jnp.pad(emit, ((0, Tp - T), (0, Bp - B), (0, Sp - S)),
                   constant_values=NEG_INF)
    skip = jnp.pad(skip, ((0, Bp - B), (0, Sp - S)))
    valid = jnp.pad(valid, ((0, Bp - B), (0, Sp - S)))
    lengths = jnp.pad(lengths, ((0, Bp - B),), constant_values=1)
    out = [emit, skip, valid, lengths.reshape(Bp, 1)]
    if extra is not None:
        out.append(jnp.pad(extra, ((0, Bp - B), (0, Sp - S))))
    return out, (Bp, Sp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def alpha_recursion(
    emit: jnp.ndarray,       # (T, B, S) float32
    skip: jnp.ndarray,       # (B, S) float {0,1}
    valid: jnp.ndarray,      # (B, S) float {0,1}
    input_lengths: jnp.ndarray,  # (B,) int32
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the CTC alpha recursion; returns alphas (T, B, S)."""
    T, B, S = emit.shape
    (emit_p, skip_p, valid_p, len_p), (Bp, Sp) = _pad_inputs(
        emit, skip, valid, input_lengths
    )
    Tp = emit_p.shape[0]
    chunk_t = _chunk_t(Sp)
    grid = (Bp // BATCH_BLOCK, Tp // chunk_t)
    out = pl.pallas_call(
        functools.partial(_alpha_kernel, chunk_t=chunk_t),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk_t, BATCH_BLOCK, Sp), lambda b, t: (t, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, Sp), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, Sp), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, 1), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_t, BATCH_BLOCK, Sp),
                               lambda b, t: (t, b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BATCH_BLOCK, Sp), jnp.float32)],
        interpret=interpret,
    )(emit_p, skip_p, valid_p, len_p)
    return out[:T, :B, :S]


@functools.partial(jax.jit, static_argnames=("interpret",))
def beta_recursion(
    emit: jnp.ndarray,
    skip_fwd: jnp.ndarray,
    valid: jnp.ndarray,
    input_lengths: jnp.ndarray,
    last_state: jnp.ndarray,  # (B, S) float {0,1} terminal-state mask
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the CTC beta recursion; returns betas (T, B, S)."""
    T, B, S = emit.shape
    (emit_p, skip_p, valid_p, len_p, last_p), (Bp, Sp) = _pad_inputs(
        emit, skip_fwd, valid, input_lengths, extra=last_state
    )
    Tp = emit_p.shape[0]
    chunk_t = _chunk_t(Sp)
    num_chunks = Tp // chunk_t
    grid = (Bp // BATCH_BLOCK, num_chunks)
    # Time-reversed streaming: grid step r reads/writes time chunk n-1-r.
    rev = lambda b, r: (num_chunks - 1 - r, b, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_beta_kernel, chunk_t=chunk_t),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp, Sp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk_t, BATCH_BLOCK, Sp), rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, Sp), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, Sp), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, 1), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH_BLOCK, Sp), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_t, BATCH_BLOCK, Sp), rev,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BATCH_BLOCK, Sp), jnp.float32)],
        interpret=interpret,
    )(emit_p, skip_p, valid_p, len_p, last_p)
    return out[:T, :B, :S]
