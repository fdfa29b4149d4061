#!/bin/bash
# Round-5 batch 5: decode-kernel batch-blocking re-measure (new code must
# re-prove numerics on hardware + re-measure generate after the two-stage
# top-k and batch-blocked decode kernels), the qb (in-kernel qkv bias) A/B,
# and the full-unroll probe (static layer indices turn the saved-residual
# DS/DUS copies, ~27 ms/step, into aliasable offsets — if the axon helper
# accepts the program).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5e_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py
run python tools/bench_generate.py --beams 1
run python tools/bench_generate.py --beams 5

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --grad-dtype bfloat16 --ffn-block-dg --remat save_qk_ctx"
# qb A/B at the v3 stack (the feature requires v3 stats).
run python tools/bench_config.py $STACK --attn-stats v3
run python tools/bench_config.py $STACK --attn-stats v3 --qkv-bias
# Full-unroll probe.
run python tools/bench_config.py $STACK --attn-stats v3 --unroll 24
echo "PROBES DONE" >> "$LOG"
