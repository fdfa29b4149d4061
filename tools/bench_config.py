"""One-configuration throughput probe for the wav2vec2 CTC train step.

Used for perf sweeps on real hardware: run one (batch, remat, mu_dtype,
fe_remat) point per process so an OOM in one config cannot poison the next.

    python tools/bench_config.py --batch 32 --remat save_matmul_inputs \
        --mu-dtype bfloat16 --fe-remat

Prints one JSON line with step time and audio-sec/sec/chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coral_tpu import _platform  # noqa: F401  (JAX_PLATFORMS=cpu runs)

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

SR = 16_000


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=int, default=10)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument("--remat", default="nothing_saveable",
                   help="none | nothing_saveable | dots_saveable | "
                        "save_matmul_inputs | save_matmul_inputs_ffn")
    p.add_argument("--mu-dtype", default=None)
    p.add_argument("--grad-dtype", default=None,
                   help="bfloat16 = bf16 gradient buffers (f32 master "
                        "params + f32 optimizer update)")
    p.add_argument("--fe-remat", action="store_true")
    p.add_argument("--freeze-fe", action="store_true")
    p.add_argument("--attention", default="pallas", help="pallas | xla | flash")
    p.add_argument("--attn-stats", nargs="?", const=True, default=False,
                   type=lambda v: v if v in ("v2", "v3") else bool(v),
                   help="save the attention fwd log-sum-exp as a residual "
                        "(one-pass p rebuild in bwd; pair with "
                        "remat=nothing_saveable)")
    p.add_argument("--no-fused-fe", action="store_true",
                   help="XLA convs + LN+GELU kernel instead of the fused "
                        "conv+LN+GELU feature-encoder kernel")
    p.add_argument("--ln", default="pallas",
                   help="encoder LN impl: pallas | xla")
    p.add_argument("--fused-ffn", action="store_true",
                   help="fuse the FFN up-projection with its GELU+dropout "
                        "epilogue (ops/ffn_pallas.py)")
    p.add_argument("--fused-ffn-ln", action="store_true",
                   help="additionally fold the pre-FFN LayerNorm into the "
                        "fused kernel (implies --fused-ffn)")
    p.add_argument("--ffn-block-dg", action="store_true",
                   help="compute dg = dy @ W2^T inside the block backward "
                        "kernel (implies --ffn-block)")
    p.add_argument("--ffn-block-fc2", action="store_true",
                   help="fold fc2 into the block's forward kernel "
                        "(implies --ffn-block)")
    p.add_argument("--ffn-block-dw", action="store_true",
                   help="in-kernel dW accumulation in the FFN block "
                        "backward (implies --ffn-block)")
    p.add_argument("--ffn-block", action="store_true",
                   help="whole-FFN block VJP (fc1 kernel + fc2 in one "
                        "custom_vjp; the remat replay DCEs the FFN forward; "
                        "implies --fused-ffn --fused-ffn-ln)")
    p.add_argument("--fused-qkv-ln", action="store_true",
                   help="fold the pre-attention LN into a packed QKV "
                        "projection kernel (ops/ffn_pallas.py ln_dense)")
    p.add_argument("--qkv-bias", action="store_true",
                   help="apply the q/k/v projection biases inside the "
                        "attention kernel (requires --attn-stats v3); the "
                        "backward emits dbq/dbk/dbv as in-register row sums")
    p.add_argument("--attn-o", action="store_true",
                   help="enable the o-residual (flash-delta) attention "
                        "backward (measured slower on the round-4 A/B; "
                        "default off like the model config)")
    p.add_argument("--pos-fold", action="store_true",
                   help="positional conv via factor-2 space-to-depth fold "
                        "(full MXU tiles instead of 64-channel groups)")
    p.add_argument("--unroll", type=int, default=1,
                   help="encoder layer-scan unroll factor (24 = fully static)")
    p.add_argument("--label-len", type=int, default=128)
    p.add_argument("--vocab", type=int, default=46)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--profile-dir", default=None,
                   help="capture a profiler trace of the measure loop here")
    args = p.parse_args()

    from coral_tpu.models import Wav2Vec2Config, Wav2Vec2ForCTC
    from coral_tpu.parallel import (
        batch_sharding,
        create_mesh,
        replicated,
        zero_shardings,
    )
    from coral_tpu.training import TrainState, create_optimizer
    from coral_tpu.training.train_state import make_ctc_train_step

    devices = jax.devices()
    n_chips = len(devices)
    mesh = create_mesh()

    config = Wav2Vec2Config.xls_r_300m(
        vocab_size=args.vocab, dtype=jnp.bfloat16,
        attention_impl=args.attention, fused_fe_conv=not args.no_fused_fe,
        encoder_ln_impl=args.ln, attention_save_stats=args.attn_stats,
        fused_ffn=(args.fused_ffn or args.fused_ffn_ln or args.ffn_block
                   or args.ffn_block_dw or args.ffn_block_fc2
                   or args.ffn_block_dg),
        fused_ffn_ln=(args.fused_ffn_ln or args.ffn_block
                      or args.ffn_block_dw or args.ffn_block_fc2
                      or args.ffn_block_dg),
        fused_ffn_block=(args.ffn_block or args.ffn_block_dw
                         or args.ffn_block_fc2 or args.ffn_block_dg),
        fused_ffn_block_dw=args.ffn_block_dw,
        fused_ffn_block_fc2=args.ffn_block_fc2,
        fused_ffn_block_dg=args.ffn_block_dg,
        fused_qkv_ln=args.fused_qkv_ln,
        attention_fused_qkv_bias=args.qkv_bias,
        pos_conv_fold=args.pos_fold,
        attention_o_residual=args.attn_o,
    )
    model = Wav2Vec2ForCTC(
        config,
        gradient_checkpointing=args.remat != "none",
        remat_policy=args.remat if args.remat != "none" else "nothing_saveable",
        remat_feature_encoder=args.fe_remat,
        scan_unroll=args.unroll,
    )

    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, SR)), jnp.asarray([SR]))[
        "params"
    ]
    tx, schedule = create_optimizer(
        learning_rate=1e-4, warmup_steps=100, max_steps=100_000,
        mu_dtype=args.mu_dtype,
    )
    state = TrainState.create(params, tx)
    train_step = make_ctc_train_step(
        model, tx, schedule, blank_id=args.vocab - 1,
        freeze_feature_encoder=args.freeze_fe,
        grad_dtype=args.grad_dtype,
    )

    param_sh = jax.tree.map(lambda _: replicated(mesh), state.params)
    opt_sh = zero_shardings(state.opt_state, mesh)
    state_sh = TrainState(step=replicated(mesh), params=param_sh, opt_state=opt_sh)
    data_sh = batch_sharding(mesh, axis=1)
    batch_sh = {k: data_sh for k in
                ("input_values", "input_lengths", "labels", "label_lengths")}

    jitted = jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )

    T = args.seconds * SR
    global_batch = args.batch * n_chips
    rng_np = np.random.default_rng(0)
    batch = {
        "input_values": rng_np.standard_normal(
            (args.accum, global_batch, T)
        ).astype(np.float32),
        "input_lengths": np.full((args.accum, global_batch), T, dtype=np.int32),
        "labels": rng_np.integers(
            0, args.vocab - 1, size=(args.accum, global_batch, args.label_len)
        ).astype(np.int32),
        "label_lengths": np.full(
            (args.accum, global_batch), args.label_len, dtype=np.int32
        ),
    }
    state = jax.device_put(state, state_sh)
    batch = jax.device_put(batch, batch_sh)

    for i in range(args.warmup):
        state, metrics = jitted(state, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])  # host fetch = reliable sync on the axon platform

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = jitted(state, batch, jax.random.PRNGKey(100 + i))
    final_loss = float(metrics["loss"])
    elapsed = time.perf_counter() - t0
    if args.profile_dir:
        jax.profiler.stop_trace()
    assert np.isfinite(final_loss)

    audio_seconds = args.steps * args.accum * global_batch * args.seconds
    print(json.dumps({
        "batch": args.batch,
        "remat": args.remat,
        "mu_dtype": args.mu_dtype,
        "grad_dtype": args.grad_dtype,
        "fe_remat": args.fe_remat,
        "unroll": args.unroll,
        "fused_fe": not args.no_fused_fe,
        "fused_ffn": args.fused_ffn or args.fused_ffn_ln or args.ffn_block,
        "fused_ffn_ln": args.fused_ffn_ln or args.ffn_block,
        "ffn_block": args.ffn_block or args.ffn_block_dw or args.ffn_block_fc2,
        "ffn_block_dw": args.ffn_block_dw,
        "ffn_block_fc2": args.ffn_block_fc2,
        "ffn_block_dg": args.ffn_block_dg,
        "fused_qkv_ln": args.fused_qkv_ln,
        "qkv_bias": args.qkv_bias,
        "pos_fold": args.pos_fold,
        "attn_o": args.attn_o,
        "ln": args.ln,
        "freeze_fe": args.freeze_fe,
        "step_ms": round(elapsed / args.steps * 1000, 1),
        "audio_sec_per_sec_per_chip": round(
            audio_seconds / elapsed / n_chips, 2
        ),
    }))


if __name__ == "__main__":
    main()
