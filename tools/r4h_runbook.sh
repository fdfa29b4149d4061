#!/bin/bash
# Round-4 TPU batch 8 (final): last composable candidates on the adopted
# 918.8 stack.
# 1. CORAL_ATTN_PIPE=1 — one-ahead head pipelining in the stats attention
#    kernels (MXU/VPU dual-issue without the FE attempt's sub-sliced
#    writes).
# 2. B=52 — the save_qk_ctx stack freed HBM; probe the next batch step.
# 3. Whisper-small B=20 — same question on the whisper side.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4h_runbook.log}
: > "$LOG"
run() { echo "=== ${EXTRA_ENV:-} $*" >> "$LOG"; timeout ${T:-1500} env ${EXTRA_ENV:-} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

STACK="--steps 12 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block --attn-stats v2 --remat save_qk_ctx"
EXTRA_ENV="CORAL_ATTN_PIPE=1" run python tools/bench_config.py $STACK --batch 48
run python tools/bench_config.py $STACK --batch 52
run python tools/bench_whisper.py --steps 10 --ffn-block --grad-dtype bfloat16 --batch 20
echo "PROBES DONE" >> "$LOG"
