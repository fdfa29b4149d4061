#!/bin/bash
# Round-5 batch 3: adjudicate the step-time grind candidates on hardware.
#   1. FE halo-via-blockspec (in HEAD) alone: v2 stats at the adopted stack
#      vs the 958.44/500.8ms r5 baseline (pre-halo).
#   2. Attention stats v3 (lse + o-residual delta bwd) vs v2.
#   3. verify_kernels: numerics of the halo change + margins on hardware.
#   4. B=52 retry (OOM'd by 15 MB in r4).
#   5. probe_lane_reduce adjudication (standing from r4).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5c_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --grad-dtype bfloat16 --ffn-block-dg --remat save_qk_ctx"

run python tools/verify_kernels.py
run python tools/bench_config.py $STACK --attn-stats v2
run python tools/bench_config.py $STACK --attn-stats v3
run python tools/bench_config.py $STACK --attn-stats v3 --batch 52
# FE bwd dW-accumulator traffic scales with the block count (6 MB of f32
# scratch r+w per (b, t) block); TB=512 halves it. The 19.3 MB block set
# that stopped TB=512 in round 3 was a 16 MB-scope limit, lifted since.
CORAL_FE_TB=512 run python tools/bench_config.py $STACK --attn-stats v2
CORAL_FE_TB=512 run python tools/verify_kernels.py
run python tools/probe_lane_reduce.py
echo "PROBES DONE" >> "$LOG"
