#!/bin/bash
# Round-3 continuation probes, ordered by decision value:
# 1. Mosaic numerics for the new ln_dense kernel (+ everything else)
# 2. fused_qkv_ln on top of the adopted stack (the candidate headline)
# 3. adopted-stack reference re-run (same-session control)
# 4. save_attn_ctx remat at the adopted stack (queued in round 3, unmeasured)
# 5. scan unroll=2 at the adopted stack (queued in round 3, unmeasured)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3b_probes.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout 1500 "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py
STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16"
run python tools/bench_config.py $STACK --fused-qkv-ln
run python tools/bench_config.py $STACK
run python tools/bench_config.py $STACK --remat save_attn_ctx
run python tools/bench_config.py $STACK --unroll 2
echo "PROBES DONE" >> "$LOG"
