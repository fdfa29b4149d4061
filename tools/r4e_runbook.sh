#!/bin/bash
# Round-4 TPU batch 5: memory-aggressive replay elimination + a fresh
# profile of the new best stack + the e2e number for PARITY.
# 1. B=48 v2-stats stack + save_qkv_ctx (replay then carries only LN +
#    out-proj; ~4.7 GB of saved projections — OOM is an acceptable probe
#    outcome, each config runs in its own process).
# 2. Profile capture of the adopted v2+ctx_lse stack (refresh the PARITY
#    attribution table at the new operating point).
# 3. e2e finetune-loop number on the adopted defaults (PARITY row +
#    VERDICT task 4; bench.py runs the same tool at round end).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4e_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-1500} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block --attn-stats v2"
run python tools/bench_config.py $STACK --remat save_qkv_ctx
run python tools/bench_config.py $STACK --remat save_attn_ctx_lse --profile-dir /tmp/r4e_trace
T=1800 run python tools/bench_e2e.py --steps 16 --logging-steps 4
echo "PROBES DONE" >> "$LOG"
