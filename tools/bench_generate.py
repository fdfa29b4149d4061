"""Whisper generation throughput probe (greedy / beam) with profiling.

    python tools/bench_generate.py --beams 5 --profile-dir /tmp/beam_trace

Prints one JSON line with latency, tokens/s, and audio-s/s. Used to attack
the beam5_vs_greedy_latency target (VERDICT r4 #6).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coral_tpu import _platform  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="small")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--beams", type=int, default=5)
    p.add_argument("--max-length", type=int, default=196)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--profile-dir", default=None)
    args = p.parse_args()

    from coral_tpu.models.whisper import (
        WhisperConfig, beam_generate, greedy_generate, init_whisper_params,
    )

    cfg = getattr(WhisperConfig, args.arch)(
        dtype=jnp.bfloat16, fused_ffn=True, fused_ffn_ln=True,
        fused_ffn_block=True, fused_ffn_block_dg=True,
    )
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng_np = np.random.default_rng(0)
    B = args.batch
    feats = jnp.asarray(
        rng_np.standard_normal((B, 3000, cfg.num_mel_bins)), jnp.float32
    )
    forced = jnp.asarray(
        [cfg.vocab_size - 10, cfg.vocab_size - 8, cfg.vocab_size - 7],
        jnp.int32,
    )
    eos = cfg.vocab_size - 9
    MAXLEN = args.max_length

    if args.beams == 1:
        fn = lambda p_, f: greedy_generate(  # noqa: E731
            p_, cfg, f, forced, max_length=MAXLEN, eos_id=eos
        )
    else:
        fn = lambda p_, f: beam_generate(  # noqa: E731
            p_, cfg, f, forced, max_length=MAXLEN, eos_id=eos,
            num_beams=args.beams,
        )
    run = jax.jit(fn)
    ids = run(params, feats)
    np.asarray(ids)
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        ids = run(params, feats)
    np.asarray(ids)
    el = (time.perf_counter() - t0) / args.reps
    if args.profile_dir:
        jax.profiler.stop_trace()
    print(json.dumps({
        "arch": args.arch, "batch": B, "beams": args.beams,
        "latency_ms": round(el * 1000, 1),
        "tokens_per_sec": round(B * (MAXLEN - len(forced)) / el, 1),
        "audio_sec_per_sec": round(B * 30 / el, 1),
    }))


if __name__ == "__main__":
    main()
