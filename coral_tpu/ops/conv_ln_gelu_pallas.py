"""Fused stride-2 conv + bias + LayerNorm + exact GELU (Pallas TPU).

The wav2vec2 feature encoder (reference: HF ``Wav2Vec2FeatureEncoder``,
configured at ``src/coral/wav2vec2.py:104-126``) runs six stride-2 conv
blocks (k=3 for layers 1-4, k=2 for layers 5-6, C=512) each followed by
LayerNorm-over-channels and exact GELU. XLA lowers each block as a conv
custom-call plus separate LN/GELU fusions, paying HBM round-trips for the
conv output and the normalised tensor, plus layout copies around the strided
window (~58 ms/step of the 411 ms wav2vec2-315M step at B=32 x 10 s in the
round-3 profile, vs a ~30 ms flop floor).

This kernel computes one whole block in a single pass over the input:

- A stride-2 conv with kernel k over rows is exactly ``even @ W0 + odd @ W1
  (+ shift(even) @ W2)`` where ``even``/``odd`` are the deinterleaved input
  rows. The kernel loads a contiguous (2*TB, C) row slab (natural layout, no
  XLA relayout), deinterleaves via the free (TB, 2C) pair-fold reshape plus
  two lane slices, and runs 2-3 full-width (TB, C) @ (C, C) MXU matmuls —
  contraction and output are both C=512, so the MXU runs full, unlike an
  im2col formulation which materialises patch tensors in HBM (measured 750
  vs 778 audio-s/s in round 3).
- The one even row a k=3 window needs from the next slab (input row
  2*TB*(t+1)) arrives through a second block-mapped view of the input whose
  index map points at the next slab (clamped on the last slab, whose halo
  only feeds masked/clipped outputs) — it rides the kernel's own DMA
  pipeline instead of the round-3 strided XLA gather (~3 ms/step at
  B=48 x 10 s).
- Bias, fp32 LayerNorm stats, and exact GELU are applied in-register; only
  the final activation ``y``, the pre-affine normalised tensor ``xhat`` and
  the per-row ``rstd`` leave the kernel (``xhat``/``rstd`` make the backward
  matmul-recompute-free without ever dividing by gamma).
- Backward fuses dGELU + dLN + conv-dx + conv-dW + dbias/dgamma/dbeta in one
  pass: ``da`` is formed in-register from (xhat, rstd, dy), dx's even/odd rows
  come from ``da @ W^T`` matmuls re-interleaved in VMEM, the cross-slab k=3
  term is emitted as a per-slab halo row added outside, and the (k, C, C)
  dW accumulates in an fp32 VMEM scratch across the whole grid (written once
  at the last step).

Off-TPU the public entry points compose plain XLA ops (same math, fp32
stats), so CPU tests exercise identical semantics.
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

# Output rows per grid step (input slab = 2*TB rows). 256 is the measured
# round-3 optimum under the default 16 MB scoped-VMEM compiler limit;
# env-overridable so tools/bench_config.py sweeps can probe without edits.
# For TB > 256 the pallas calls raise vmem_limit_bytes (v5e has 128 MB
# physical VMEM; the 16 MB scope is only the compiler default), which is
# what blocked TB=512 in round 3 (19.3 MB backward block set).
_TB = int(os.environ.get("CORAL_FE_TB", "256"))
_COMPILER_PARAMS = (
    None if _TB <= 256
    else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
)
_HALO = 16     # halo fixup block sublanes (>= bf16 min tile)
# Sub-blocks per grid step: with >1 the kernel phase-groups the work
# (all conv matmuls first, then all LN+GELU epilogues), handing Mosaic's
# scheduler independent MXU and VPU streams to dual-issue — the epilogue
# of sub-block i can overlap the matmuls of sub-block i+1. 1 = the
# round-3 single-phase body. CORAL_FE_SPLIT_WHERE bisects a lowering
# failure: "both" (default) | "fwd" | "bwd".
_SPLIT = int(os.environ.get("CORAL_FE_SPLIT", "1"))
_SPLIT_WHERE = os.environ.get("CORAL_FE_SPLIT_WHERE", "both")
_SPLIT_FWD = _SPLIT if _SPLIT_WHERE in ("both", "fwd") else 1
_SPLIT_BWD = _SPLIT if _SPLIT_WHERE in ("both", "bwd") else 1


def _deinterleave(x):
    """(2N, C) -> even rows (N, C), odd rows (N, C).

    The pair-fold reshape (2N, C) -> (N, 2C) is row-major contiguous, so the
    even/odd split becomes two tile-aligned lane slices (the layout the round-3
    Mosaic prototype validated) instead of sublane-strided gathers.
    """
    n2, c = x.shape
    xf = x.reshape(n2 // 2, 2 * c)
    return xf[:, :c], xf[:, c:]


def _interleave(even, odd):
    """even/odd (N, C) -> (2N, C) with even rows at 0, 2, 4, ..."""
    n, c = even.shape
    return jnp.concatenate([even, odd], axis=1).reshape(2 * n, c)


def _halo_spec(nT, C):
    """Second view of x delivering the one even row a k=3 window needs from
    the next slab (input row ``2*_TB*(t+1)``): a (1, _HALO, C) block of x
    whose index map points at the next slab's first rows, clamped to the
    last slab for t = nT-1 (whose halo only ever feeds masked/clipped
    outputs). Replaces the round-3 strided XLA gather, which cost ~3 ms/step
    at B=48 x 10 s (a stride-512 slice over 160k rows lowers as a gather);
    here the rows ride the kernel's own DMA pipeline."""
    blocks_per_slab = 2 * _TB // _HALO
    return pl.BlockSpec(
        (1, _HALO, C),
        lambda b, t: (b, jnp.minimum(t + 1, nT - 1) * blocks_per_slab, 0),
    )


def _conv_rows(even, odd, even_next, w_ref, k: int):
    """Stride-2 conv over deinterleaved rows -> fp32 (TB, C) accumulator."""
    mm = lambda a, i: jax.lax.dot_general(  # noqa: E731
        a, w_ref[i], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = mm(even, 0) + mm(odd, 1)
    if k == 3:
        acc = acc + mm(even_next, 2)
    return acc


def _sub_slices(n: int, split: int):
    """Row sub-slices for the phase-grouped kernel bodies."""
    splits = split if split > 1 and n % split == 0 else 1
    step = n // splits
    return [slice(i * step, (i + 1) * step) for i in range(splits)]


def _fwd_kernel(x_ref, halo_ref, w_ref, b_ref, g_ref, beta_ref,
                y_ref, xhat_ref, rstd_ref, *, k: int, eps: float):
    even, odd = _deinterleave(x_ref[0])
    if k == 3:
        # shift(even): rows 1..TB-1 of even, then the halo row (= input row
        # 2*TB*(t+1), i.e. the next slab's row 0, block-mapped via
        # ``_halo_spec``'s second view of x).
        even_next = jnp.concatenate([even[1:], halo_ref[0, :1]], axis=0)
    else:
        even_next = None
    bias = b_ref[...].astype(jnp.float32)

    # Phase 1: all conv matmuls (MXU). Phase 2: all LN+GELU epilogues
    # (VPU). With _SPLIT > 1 the phases are independent across sub-blocks,
    # so the scheduler can overlap sub-block i's epilogue with i+1's
    # matmuls.
    subs = _sub_slices(even.shape[0], _SPLIT_FWD)
    accs = [
        _conv_rows(even[sl], odd[sl],
                   even_next[sl] if k == 3 else None, w_ref, k) + bias
        for sl in subs
    ]
    for sl, acc in zip(subs, accs):
        mu = jnp.mean(acc, axis=-1, keepdims=True)
        cen = acc - mu
        var = jnp.mean(cen * cen, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        # The saved LN residual is the PRE-affine normalised tensor: the
        # backward then never divides by gamma (a zero/tiny LN scale channel
        # would turn (h - beta)/gamma into NaN/Inf gradients where the XLA
        # path stays finite), and h is one FMA away.
        xhat = cen * rstd
        h = xhat * g_ref[...].astype(jnp.float32) + beta_ref[...].astype(
            jnp.float32
        )
        y, _ = _gelu_parts(h)
        y_ref[0, sl] = y.astype(y_ref.dtype)
        xhat_ref[0, sl] = xhat.astype(xhat_ref.dtype)
        rstd_ref[0, sl] = rstd


def _bwd_kernel(x_ref, halo_ref, w_ref, g_ref, beta_ref, xhat_ref, rstd_ref,
                dy_ref, dx_ref, dhalo_ref, dw_ref, dvec_ref, dw_acc, dvec_acc,
                *, k: int, n_rows: int, eps: float):
    t = pl.program_id(1)
    t_last = pl.num_programs(1) - 1

    @pl.when(t == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        dvec_acc[...] = jnp.zeros_like(dvec_acc)

    gamma = g_ref[...].astype(jnp.float32)
    beta = beta_ref[...].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)

    def block(masked: bool):
        # Rows past n_rows in the ragged LAST block hold pad data (on real
        # TPUs out-of-bounds block reads are unspecified, possibly NaN);
        # their dx is clipped on write, but everything that feeds the
        # dW/dvec accumulators — including 0 * NaN products — must be
        # masked to true zeros. Interior blocks are complete by
        # construction, so only the last block pays the ~10 masking passes
        # per (TB, C) tile (measured ~4 ms/step across the FE at B=48:
        # tools/probe_fe_bwd.py).
        if masked:
            row = t * dy.shape[0] + jax.lax.broadcasted_iota(
                jnp.int32, dy.shape, 0
            )
            mask = row < n_rows

        # Phase 1 (VPU, per sub-block): GELU + LayerNorm backward -> da.
        # Phase 2 (MXU, per sub-block below): the dx matmuls. With
        # _SPLIT > 1 sub-block i's matmuls are independent of i+1's VPU
        # phase, giving the scheduler dual-issue opportunities.
        da_subs = []
        for sl in _sub_slices(dy.shape[0], _SPLIT_BWD):
            xhat_s = xhat_ref[0, sl].astype(jnp.float32)
            rstd_s = rstd_ref[0, sl]
            if masked:
                m_s = mask[sl]
                xhat_s = jnp.where(m_s, xhat_s, 0.0)
                rstd_s = jnp.where(m_s[:, :1], rstd_s, 0.0)
            h = xhat_s * gamma + beta
            # GELU backward: dh = dy * gelu'(h).
            dh = dy[sl] * _dgelu(h)
            if masked:
                dh = jnp.where(m_s, dh, 0.0)
            # LayerNorm backward (xhat saved pre-affine — no gamma divide).
            dvec_acc[0, :] += jnp.sum(dh * xhat_s, axis=0)   # dgamma
            dvec_acc[1, :] += jnp.sum(dh, axis=0)            # dbeta
            dn = dh * gamma
            da_s = (
                dn
                - jnp.mean(dn, axis=-1, keepdims=True)
                - xhat_s * jnp.mean(dn * xhat_s, axis=-1, keepdims=True)
            ) * rstd_s
            dvec_acc[2, :] += jnp.sum(da_s, axis=0)          # dbias
            da_subs.append(da_s.astype(x_ref.dtype))

        # conv dx: even rows get da @ W0^T (+ prev-row da @ W2^T for k=3),
        # odd rows get da @ W1^T.
        mmT = lambda a, i: jax.lax.dot_general(  # noqa: E731
            a, w_ref[i], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dab = (jnp.concatenate(da_subs, axis=0) if len(da_subs) > 1
               else da_subs[0])
        d_even = (jnp.concatenate([mmT(a, 0) for a in da_subs], axis=0)
                  if len(da_subs) > 1 else mmT(dab, 0))
        d_odd = (jnp.concatenate([mmT(a, 1) for a in da_subs], axis=0)
                 if len(da_subs) > 1 else mmT(dab, 1))
        if k == 3:
            dw2 = mmT(dab, 2)
            # row 2i+2 of dx gets da[i] @ W2^T: within the slab that lands
            # on even rows 1..TB-1; the last row spills into the next
            # slab's row 0, emitted as a halo row summed in XLA outside.
            d_even = d_even + jnp.concatenate(
                [jnp.zeros_like(dw2[:1]), dw2[:-1]], axis=0
            )
            dhalo_ref[0, 0] = dw2[-1:].astype(dhalo_ref.dtype)
        dx_ref[0] = _interleave(
            d_even.astype(dx_ref.dtype), d_odd.astype(dx_ref.dtype)
        )

        # conv dW: dW_tap = sum_t in_tap[t]^T da[t], grid-accumulated. The
        # last block's input rows are masked too: x pad rows are
        # unspecified on TPU and pair with dab rows that are zero, but
        # 0 * NaN would still poison dW.
        even, odd = _deinterleave(x_ref[0])
        if k == 3:
            # Shift before masking: row j's tap-2 input x[2j+2] sits in
            # even row j+1, whose own output row may be invalid while row
            # j is not.
            even_next = jnp.concatenate([even[1:], halo_ref[0, :1]], axis=0)
            if masked:
                even_next = jnp.where(mask, even_next, 0)
        if masked:
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

    @pl.when(t < t_last)
    def _():
        block(masked=False)

    @pl.when(t == t_last)
    def _():
        block(masked=True)
        dw_ref[0] = dw_acc[...]
        dvec_ref[0] = dvec_acc[...]


def _grid_specs(B, T_out, C, k):
    nT = pl.cdiv(T_out, _TB)
    x_spec = pl.BlockSpec((1, 2 * _TB, C), lambda b, t: (b, t, 0))
    # Halo: a second block-mapped view of x pointing at the next slab's
    # first rows (see ``_halo_spec``).
    halo_spec = _halo_spec(nT, C)
    w_spec = pl.BlockSpec((k, C, C), lambda b, t: (0, 0, 0))
    vec_spec = pl.BlockSpec((C,), lambda b, t: (0,))
    out_spec = pl.BlockSpec((1, _TB, C), lambda b, t: (b, t, 0))
    rstd_spec = pl.BlockSpec((1, _TB, 1), lambda b, t: (b, t, 0))
    return nT, x_spec, halo_spec, w_spec, vec_spec, out_spec, rstd_spec


def _fwd_pallas(x, w, b, gamma, beta, k, eps, interpret):
    B, T_in, C = x.shape
    T_out = (T_in - k) // 2 + 1
    nT, x_spec, halo_spec, w_spec, vec_spec, out_spec, rstd_spec = _grid_specs(
        B, T_out, C, k
    )
    y, xhat, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, eps=eps),
        grid=(B, nT),
        in_specs=[x_spec, halo_spec, w_spec, vec_spec, vec_spec, vec_spec],
        out_specs=[out_spec, out_spec, rstd_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_out, C), x.dtype),
            jax.ShapeDtypeStruct((B, T_out, C), x.dtype),
            jax.ShapeDtypeStruct((B, T_out, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, w, b, gamma, beta)
    return y, xhat, rstd


def _bwd_pallas(x, w, gamma, beta, xhat, rstd, dy, k, eps, interpret):
    """Returns (dx, dw_rows (B,k,C,C) fp32, dvec_rows (B,3,C) fp32).

    Weight-grad partials are per batch row (reduced by the caller with plain
    jnp sums so GSPMD inserts the cross-shard psum — same pattern as
    ``ln_gelu_pallas._bwd_pallas``).
    """
    B, T_in, C = x.shape
    T_out = xhat.shape[1]
    nT, x_spec, halo_spec, w_spec, vec_spec, out_spec, rstd_spec = _grid_specs(
        B, T_out, C, k
    )
    dx_spec = pl.BlockSpec((1, 2 * _TB, C), lambda b, t: (b, t, 0))
    dhalo_spec = pl.BlockSpec((1, 1, 1, C), lambda b, t: (b, t, 0, 0))
    dw_spec = pl.BlockSpec((1, k, C, C), lambda b, t: (b, 0, 0, 0))
    dvec_spec = pl.BlockSpec((1, 3, C), lambda b, t: (b, 0, 0))
    dx, dhalo, dw_rows, dvec_rows = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, n_rows=T_out, eps=eps),
        grid=(B, nT),
        in_specs=[x_spec, halo_spec, w_spec, vec_spec, vec_spec, out_spec,
                  rstd_spec, out_spec],
        out_specs=[dx_spec, dhalo_spec, dw_spec, dvec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_in, C), x.dtype),  # ragged last block
            jax.ShapeDtypeStruct((B, nT, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, k, C, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, C, C), jnp.float32),
            pltpu.VMEM((3, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(x, x, w, gamma, beta, xhat, rstd, dy)
    if k == 3:
        # Slab t's last output row drives input row 2*_TB*(t+1); that lands
        # in slab t+1's first row. The last slab never spills on the kernel
        # path (the exact-fit shapes where it would are routed to the XLA
        # fallback in ``conv_ln_gelu``), so its zero dhalo row is skipped.
        n_fix = nT - 1
        if n_fix > 0:
            dx = _halo_fixup(dx, dhalo, n_fix, interpret)
    return dx, dw_rows, dvec_rows


def _fixup_kernel(dx_ref, dh_ref, out_ref):
    blk = dx_ref[0]
    out_ref[0] = jnp.concatenate(
        [(blk[:1].astype(jnp.float32) + dh_ref[0, 0]).astype(blk.dtype), blk[1:]],
        axis=0,
    )


def _halo_fixup(dx, dhalo, n_fix, interpret):
    """In-place add of the per-slab k=3 spill rows: slab t's last output row
    also drives input row 2*_TB*(t+1) (= slab t+1's first row). Touches only
    ``n_fix`` 16-row blocks; ``input_output_aliases`` keeps it a true
    in-place update on the big dx buffer instead of a full-tensor scatter
    copy."""
    B, T_in, C = dx.shape
    dx_spec = pl.BlockSpec(
        (1, _HALO, C), lambda b, t: (b, (t + 1) * (2 * _TB) // _HALO, 0)
    )
    dh_spec = pl.BlockSpec((1, 1, 1, C), lambda b, t: (b, t, 0, 0))
    return pl.pallas_call(
        _fixup_kernel,
        grid=(B, n_fix),
        in_specs=[dx_spec, dh_spec],
        out_specs=dx_spec,
        out_shape=jax.ShapeDtypeStruct(dx.shape, dx.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(dx, dhalo)


# ---------------------------------------------------------------------------
# custom_partitioning: batch-parallel over dim 0; weight grads need a psum
# across batch shards, which runs as plain XLA outside the kernel (the bwd
# pallas call emits full dW per shard; jnp sums stay in the partitioned fn).
# ---------------------------------------------------------------------------


from .ln_gelu_pallas import _row_only as _batch_only  # noqa: E402


@functools.lru_cache(maxsize=None)
def _fwd_cp(k, eps, interpret):
    f = custom_partitioning(
        lambda x, w, b, g, beta: _fwd_pallas(
            x, w, b, g, beta, k, eps, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh3 = _batch_only(arg_infos[0].sharding, mesh, 3)
        sh2 = _batch_only(arg_infos[0].sharding, mesh, 2)
        return (sh3, sh3, sh2)

    def partition(mesh, arg_infos, result_infos):
        sh3 = _batch_only(arg_infos[0].sharding, mesh, 3)
        sh2 = _batch_only(arg_infos[0].sharding, mesh, 2)
        rep = NamedSharding(mesh, P())
        lower = lambda x, w, b, g, beta: _fwd_pallas(  # noqa: E731
            x, w, b, g, beta, k, eps, interpret
        )
        rep1 = NamedSharding(mesh, P(None))
        return (
            mesh, lower, (sh3, sh3, sh2),
            (sh3, NamedSharding(mesh, P(None, None, None)), rep1, rep1, rep1),
        )

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b t c, k c d, d, d, d -> b s d, b s d, b s r",
    )
    return f


@functools.lru_cache(maxsize=None)
def _bwd_cp(k, eps, interpret):
    f = custom_partitioning(
        lambda x, w, g, beta, xhat, rstd, dy: _bwd_pallas(
            x, w, g, beta, xhat, rstd, dy, k, eps, interpret
        )
    )

    def infer(mesh, arg_infos, result_infos):
        sh3 = _batch_only(arg_infos[0].sharding, mesh, 3)
        sh4 = _batch_only(arg_infos[0].sharding, mesh, 4)
        return (sh3, sh4, sh3)

    def partition(mesh, arg_infos, result_infos):
        sh3 = _batch_only(arg_infos[0].sharding, mesh, 3)
        sh4 = _batch_only(arg_infos[0].sharding, mesh, 4)
        sh2 = _batch_only(arg_infos[0].sharding, mesh, 2)
        rep1 = NamedSharding(mesh, P(None))
        lower = lambda x, w, g, beta, xhat, rstd, dy: _bwd_pallas(  # noqa: E731
            x, w, g, beta, xhat, rstd, dy, k, eps, interpret
        )
        return (
            mesh, lower, (sh3, sh4, sh3),
            (sh3, NamedSharding(mesh, P(None, None, None)), rep1, rep1,
             sh3, sh2, sh3),
        )

    f.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=(
            "b t c, k c d, d, d, b s d, b s r, b s d -> "
            "b t c, b k c d, b u d"
        ),
    )
    return f


def _xla_reference(x, w, b, gamma, beta, k, eps):
    """Plain-ops composition (CPU path and numerics oracle)."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(2,), padding=[(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    out = out.astype(jnp.float32) + b.astype(jnp.float32)
    mu = jnp.mean(out, axis=-1, keepdims=True)
    cen = out - mu
    var = jnp.mean(cen * cen, axis=-1, keepdims=True)
    n = cen * jax.lax.rsqrt(var + eps)
    z = n * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return gelu_poly(z).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _conv_ln_gelu(x, w, b, gamma, beta, k, eps, interpret):
    y, _, _ = _fwd_cp(k, eps, interpret)(x, w, b, gamma, beta)
    return y


def _conv_ln_gelu_fwd(x, w, b, gamma, beta, k, eps, interpret):
    y, xhat, rstd = _fwd_cp(k, eps, interpret)(x, w, b, gamma, beta)
    return y, (x, w, gamma, beta, xhat, rstd)


def _conv_ln_gelu_bwd(k, eps, interpret, res, dy):
    x, w, gamma, beta, xhat, rstd = res
    dx, dw_rows, dvec_rows = _bwd_cp(k, eps, interpret)(
        x, w, gamma, beta, xhat, rstd, dy
    )
    # Batch reductions as plain XLA: under a sharded batch GSPMD inserts the
    # cross-shard psum here (same pattern as ln_gelu_pallas).
    dw = jnp.sum(dw_rows, axis=0).astype(w.dtype)
    dvec = jnp.sum(dvec_rows, axis=0)
    dgamma = dvec[0].astype(gamma.dtype)
    dbeta = dvec[1].astype(beta.dtype)
    db = dvec[2]
    return dx, dw, db, dgamma, dbeta


_conv_ln_gelu.defvjp(_conv_ln_gelu_fwd, _conv_ln_gelu_bwd)


def conv_ln_gelu(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused ``gelu(layer_norm(conv1d(x, w, stride=2) + b))``.

    Args:
        x: (B, T, C) input rows (C = lane-friendly, e.g. 512).
        w: (k, C, C_out) conv kernel, k in {2, 3}, stride fixed at 2.
        b: (C_out,) conv bias.
        gamma, beta: (C_out,) LayerNorm affine parameters.
        eps: LayerNorm epsilon.

    Returns:
        (B, (T - k)//2 + 1, C_out) activations, dtype of ``x``.
    """
    k = w.shape[0]
    assert k in (2, 3), "fused path covers the k=2/k=3 stride-2 layers"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T_in, C = x.shape
    T_out = (T_in - k) // 2 + 1
    nT = pl.cdiv(T_out, _TB)
    if (
        interpret
        or C % 128 != 0
        or w.shape[1] != w.shape[2]
        # Exact-fit shapes (T_out a multiple of _TB with 1-2 input rows past
        # the slab grid) would leave dx tail rows unwritten; production FE
        # shapes are never exact-fit, so route the stragglers to XLA.
        or T_in > 2 * _TB * nT
    ):
        # Same math, plain ops (jit-friendly, differentiable).
        return _xla_reference(x, w, b, gamma, beta, k, eps)
    return _conv_ln_gelu(x, w.astype(x.dtype), b, gamma, beta, k, eps, False)
