#!/bin/bash
# Round-4 TPU batch 6: the dW-in-kernel FFN backward, the fitting
# save_qk_ctx policy, and the CORRECTED e2e loop number.
# 1. Kernel verification incl. the block_dw checks.
# 2. B=48 adopted stack + --ffn-block-dw (g/dh/ln_out never return to
#    HBM; ~27 ms/step of emission traffic at stake).
# 3. B=48 adopted stack + save_qk_ctx (save_qkv_ctx OOM'd by 281 MB;
#    q/k + ctx + lse fits — replay carries only LN + v/o projections).
# 4. Both together (the candidate round-4 final stack).
# 5. e2e loop with the fixed sync point (the r4e number measured only
#    dispatch+infeed; PARITY's row needs the honest value).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4f_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-1500} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block --attn-stats v2"
run python tools/bench_config.py $STACK --remat save_attn_ctx_lse --ffn-block-dw
run python tools/bench_config.py $STACK --remat save_qk_ctx
run python tools/bench_config.py $STACK --remat save_qk_ctx --ffn-block-dw
T=1800 run python tools/bench_e2e.py --steps 16 --logging-steps 4
echo "PROBES DONE" >> "$LOG"
