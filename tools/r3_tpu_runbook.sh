#!/bin/bash
# Round-3 TPU measurement runbook — serialized single-chip runs, one config
# per process (an OOM/compile failure cannot poison the next). Run after any
# kernel change; each line appends a JSON result to the log.
#
# ORDERED BY VALUE: the tunnel has been flaky, so the probes that decide the
# round (kernel parity, the baseline reference point, the candidate-best
# stack) run first; attribution/sweep rows follow.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_tpu_run.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout 1200 "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

# 1. Mosaic kernel parity (poly GELU + conv_ln_gelu + ffn + all production
# kernels) — everything below is meaningless if this fails.
run python tools/verify_kernels.py
# 2. the round-2 adopted configuration (reference point for every A/B below)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16
# 3. candidate-best stack: every unbenched round-3 optimisation at once
# (fused FFN + LN fold, folded posconv, bf16 grad buffers, attention lse
# residual). If the tunnel dies after this row we still know the headline.
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --attn-stats
# 4. single-feature attribution rows
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn-ln
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --grad-dtype bfloat16
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --attn-stats
# 5. pairwise/near-best variants (which feature is NOT pulling its weight?)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn --grad-dtype bfloat16
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn --grad-dtype bfloat16 --attn-stats
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn-ln --grad-dtype bfloat16 --attn-stats
# 6. batch/tile/remat sweeps
run python tools/bench_config.py --steps 12 --mu-dtype bfloat16
run env CORAL_FE_TB=384 python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16
run env CORAL_FE_TB=512 python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16
run env CORAL_FFN_TM=512 python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn
run python tools/bench_config.py --steps 12 --batch 64 --mu-dtype bfloat16 --grad-dtype bfloat16
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --unroll 2
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --remat save_matmul_inputs
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --remat save_attn_ctx
# 7. end-to-end loop throughput (real finetune(): host batcher + double-
# buffered per-microbatch device_put prefetch) — the infeed-overlap artifact;
# compare against the matching step-bench rows above
run python tools/bench_e2e.py --batch 48 --steps 30 --n-clips 256
run python tools/bench_e2e.py --batch 48 --steps 30 --n-clips 256 --extra model.fused_ffn_ln=true model.pos_conv_fold=true grad_dtype=bfloat16
# 8. whisper step A/Bs (poly GELU landed; LN + bf16 grads flagged)
run python tools/bench_whisper.py --steps 8
run python tools/bench_whisper.py --steps 8 --ln pallas
run python tools/bench_whisper.py --steps 8 --ln pallas --grad-dtype bfloat16
run python tools/bench_whisper.py --steps 8 --ln pallas --grad-dtype bfloat16 --fused-ffn
run python tools/bench_whisper.py --steps 8 --ln pallas --grad-dtype bfloat16 --fused-ffn-ln
echo "RUNBOOK DONE" >> "$LOG"
