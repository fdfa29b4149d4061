"""Whisper fine-tune step throughput probe (single chip).

    python tools/bench_whisper.py --arch small --batch 16
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
CHUNK_S = 30


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="small")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--label-len", type=int, default=128)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--remat", default=None,
                   help="nothing_saveable | save_matmul_inputs")
    p.add_argument("--ln", default="xla", help="train-path LN: xla | pallas")
    p.add_argument("--grad-dtype", default=None)
    p.add_argument("--fused-ffn", action="store_true",
                   help="fuse fc1 with its GELU+dropout epilogue "
                        "(ops/ffn_pallas.py)")
    p.add_argument("--ffn-block", action="store_true",
                   help="whole-FFN block VJP (implies --fused-ffn-ln)")
    p.add_argument("--ffn-block-fc2", action="store_true",
                   help="fold fc2 into the block's forward kernel "
                        "(implies --ffn-block)")
    p.add_argument("--ffn-block-dg", action="store_true",
                   help="dg computed inside the block backward kernel "
                        "(implies --ffn-block)")
    p.add_argument("--fused-ffn-ln", action="store_true",
                   help="additionally fold the pre-FFN LayerNorm into the "
                        "fused kernel (implies --fused-ffn)")
    p.add_argument("--profile-dir", default=None)
    args = p.parse_args()

    from coral_tpu.models.whisper import WhisperConfig, init_whisper_params
    from coral_tpu.parallel import batch_sharding, create_mesh, replicated
    from coral_tpu.training import TrainState, create_optimizer
    from coral_tpu.training.train_state import make_seq2seq_train_step

    mesh = create_mesh()
    kw = {}
    if args.remat:
        kw["remat_policy"] = args.remat
    cfg = getattr(WhisperConfig, args.arch)(
        dtype=jnp.bfloat16, ln_impl=args.ln,
        fused_ffn=(args.fused_ffn or args.fused_ffn_ln or args.ffn_block
                   or args.ffn_block_fc2 or args.ffn_block_dg),
        fused_ffn_ln=(args.fused_ffn_ln or args.ffn_block
                      or args.ffn_block_fc2 or args.ffn_block_dg),
        fused_ffn_block=args.ffn_block or args.ffn_block_fc2 or args.ffn_block_dg,
        fused_ffn_block_fc2=args.ffn_block_fc2,
        fused_ffn_block_dg=args.ffn_block_dg, **kw
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    tx, schedule = create_optimizer(
        learning_rate=1e-5, warmup_steps=100, max_steps=100_000,
        mu_dtype="bfloat16",
    )
    state = TrainState.create(params, tx)
    step = make_seq2seq_train_step(
        cfg, tx, schedule, sot_id=cfg.vocab_size - 10, pad_id=cfg.vocab_size - 9,
        chunk_length=CHUNK_S * SR, gradient_checkpointing=True,
        grad_dtype=args.grad_dtype,
    )

    state_sh = jax.tree.map(lambda _: replicated(mesh), state)
    data_sh = batch_sharding(mesh, axis=1)
    batch_sh = {k: data_sh for k in
                ("input_values", "input_lengths", "labels", "label_lengths")}
    jitted = jax.jit(
        step,
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )

    B, T, L = args.batch, CHUNK_S * SR, args.label_len
    rng_np = np.random.default_rng(0)
    batch = {
        "input_values": rng_np.standard_normal((1, B, T)).astype(np.float32),
        "input_lengths": np.full((1, B), T, np.int32),
        "labels": rng_np.integers(0, cfg.vocab_size - 20, size=(1, B, L)).astype(
            np.int32
        ),
        "label_lengths": np.full((1, B), L, np.int32),
    }
    state = jax.device_put(state, state_sh)
    batch = jax.device_put(batch, batch_sh)

    for i in range(args.warmup):
        state, metrics = jitted(state, batch, jax.random.PRNGKey(i))
    float(metrics["loss"])

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = jitted(state, batch, jax.random.PRNGKey(100 + i))
    loss = float(metrics["loss"])
    elapsed = time.perf_counter() - t0
    if args.profile_dir:
        jax.profiler.stop_trace()
    assert np.isfinite(loss)

    audio_seconds = args.steps * B * CHUNK_S
    print(json.dumps({
        "arch": args.arch,
        "batch": B,
        "ln": args.ln,
        "grad_dtype": args.grad_dtype,
        "fused_ffn": (args.fused_ffn or args.fused_ffn_ln or args.ffn_block
                      or args.ffn_block_fc2 or args.ffn_block_dg),
        "fused_ffn_ln": (args.fused_ffn_ln or args.ffn_block
                         or args.ffn_block_fc2 or args.ffn_block_dg),
        "ffn_block": args.ffn_block or args.ffn_block_fc2 or args.ffn_block_dg,
        "ffn_block_fc2": args.ffn_block_fc2,
        "ffn_block_dg": args.ffn_block_dg,
        "step_ms": round(elapsed / args.steps * 1000, 1),
        "audio_sec_per_sec_per_chip": round(audio_seconds / elapsed, 2),
    }))


if __name__ == "__main__":
    main()
