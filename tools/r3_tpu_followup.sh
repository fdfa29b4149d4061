#!/bin/bash
# Round-3 follow-up: the fused-FFN rows that failed before the Mosaic
# output-block fixes (44c3852), ordered by decision value. attn-stats was
# measured after the fix and is SLOWER (807 vs 822 reference) — excluded
# from the candidate stack; verify_kernels still covers its numerics.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_tpu_followup.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout 1200 "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

# headline candidate: every measured-positive feature, no stats
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16
# singles for attribution
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn-ln
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn
# Mosaic parity for all production kernels (first run aborted at the
# save_stats lowering failure before reaching the rest)
run python tools/verify_kernels.py
echo "RUNBOOK DONE" >> "$LOG"
