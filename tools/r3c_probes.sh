#!/bin/bash
# Round-3 continuation, batch 2: remat-policy ladder at the adopted stack,
# a profiler capture to refresh the step-time budget, then the long-compile
# B=64 retry last (it cannot block the rest).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3c_probes.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-1500} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16"
run python tools/bench_config.py $STACK --remat save_ctx_act
run python tools/bench_config.py $STACK --remat save_matmul_inputs
run python tools/bench_config.py $STACK --profile-dir /tmp/r3c_trace
T=2400 run python tools/bench_config.py --steps 12 --batch 64 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16
echo "PROBES DONE" >> "$LOG"
