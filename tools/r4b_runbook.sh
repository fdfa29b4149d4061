#!/bin/bash
# Round-4 TPU batch 2: adjudicate the o-residual (flash-delta) attention
# backward and the remaining step-level candidates on the adopted stack.
# 1. Kernel verification incl. the new o_residual checks (margins print;
#    baseline refresh happens once the round-4 kernel set settles).
# 2. B=48 A/B: o-residual ON (new default) vs OFF (round-3 backward).
# 3. B=48 save_attn_ctx with the o-residual backward (the +5.5 win from
#    r3b may compose or be subsumed).
# 4. Feature-encoder TB sweep: the 16 MB scoped-VMEM default blocked
#    TB=512 in round 3; CORAL_FE_TB>256 now raises vmem_limit_bytes.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4b_runbook.log}
: > "$LOG"
run() { echo "=== ${EXTRA_ENV:-} $*" >> "$LOG"; timeout ${T:-1500} env ${EXTRA_ENV:-} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16"
run python tools/bench_config.py $STACK
run python tools/bench_config.py $STACK --no-attn-o
run python tools/bench_config.py $STACK --remat save_attn_ctx
EXTRA_ENV="CORAL_FE_TB=512" run python tools/bench_config.py $STACK
EXTRA_ENV="CORAL_FE_TB=128" run python tools/bench_config.py $STACK
echo "PROBES DONE" >> "$LOG"
