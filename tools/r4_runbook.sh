#!/bin/bash
# Round-4 TPU batch 1, ordered by decision value:
# 1. New derived-bound kernel verification (+ record the margin baseline;
#    the round-3 harness flagged k=3 backward dw OVER even the widened
#    tolerance — the margin print quantifies it).
# 2. Whisper A/Bs (VERDICT task 5: close the whisper attribution gap).
# 3. save_ctx_act at B=40 vs B=40 control (VERDICT task 3: adjudicate).
# 4. Profiler capture of the adopted stack (VERDICT task 1: fresh budget).
# 5. save_matmul_inputs at the adopted stack (remat ladder completion).
# 6. B=64 long-compile retry, last (cannot block the rest).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-1500} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline

run python tools/bench_whisper.py --steps 10
run python tools/bench_whisper.py --steps 10 --fused-ffn-ln
run python tools/bench_whisper.py --steps 10 --fused-ffn-ln --grad-dtype bfloat16
run python tools/bench_whisper.py --steps 10 --fused-ffn-ln --grad-dtype bfloat16 --ln pallas

STACK="--steps 12 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16"
run python tools/bench_config.py $STACK --batch 40 --remat save_ctx_act
run python tools/bench_config.py $STACK --batch 40
run python tools/bench_config.py $STACK --batch 48 --profile-dir /tmp/r4_trace
run python tools/bench_config.py $STACK --batch 48 --remat save_matmul_inputs
T=2400 run python tools/bench_config.py $STACK --batch 64
echo "PROBES DONE" >> "$LOG"
