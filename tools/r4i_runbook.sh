#!/bin/bash
# Round-4 TPU batch 9: B=50 (B=52 OOM'd by 15 MB) and the FE
# phase-grouping SIGABRT bisect (fwd-only / bwd-only splits).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4i_runbook.log}
: > "$LOG"
run() { echo "=== ${EXTRA_ENV:-} $*" >> "$LOG"; timeout ${T:-1500} env ${EXTRA_ENV:-} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

STACK="--steps 12 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block --attn-stats v2 --remat save_qk_ctx"
run python tools/bench_config.py $STACK --batch 50
EXTRA_ENV="CORAL_FE_SPLIT=2 CORAL_FE_SPLIT_WHERE=fwd" run python tools/bench_config.py $STACK --batch 48
EXTRA_ENV="CORAL_FE_SPLIT=2 CORAL_FE_SPLIT_WHERE=bwd" run python tools/bench_config.py $STACK --batch 48
echo "PROBES DONE" >> "$LOG"
