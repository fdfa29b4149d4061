#!/bin/bash
# Round-4 TPU batch 11 (final): fresh profiles of the final adopted
# stacks for PARITY's budget tables (w2v2 + whisper).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4k_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block --attn-stats v2 --remat save_qk_ctx"
run python tools/bench_config.py $STACK --profile-dir /tmp/r4k_trace
run python tools/bench_whisper.py --steps 10 --ffn-block --grad-dtype bfloat16 --profile-dir /tmp/r4k_whisper_trace
echo "PROBES DONE" >> "$LOG"
