#!/bin/bash
# Round-4 TPU batch 3: the whole-FFN block VJP and the remaining
# step-level candidates, on the post-r4b defaults (o-residual reverted).
# 1. Kernel verification incl. the new ffn_ln_block checks (the baseline
#    gains their margins; everything else re-gates).
# 2. B=48 control re-measure (the round-3 stack is the default again).
# 3. B=48 + ffn_block (the replay-DCE bet: ~-25 ms/step projected).
# 4. B=48 + ffn_block + save_attn_ctx (compose: the replay then carries
#    only LN/projection matmuls).
# 5. B=48 save_matmul_inputs (the probe r4 batch 1 lost to the tunnel).
# 6. B=64 long-compile retry, last (cannot block the rest).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4c_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-1500} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16"
run python tools/bench_config.py $STACK
run python tools/bench_config.py $STACK --ffn-block
run python tools/bench_config.py $STACK --ffn-block --remat save_attn_ctx
run python tools/bench_config.py $STACK --remat save_matmul_inputs
T=2400 run python tools/bench_config.py --steps 12 --batch 64 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block
echo "PROBES DONE" >> "$LOG"
