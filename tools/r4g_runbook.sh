#!/bin/bash
# Round-4 TPU batch 7: FE phase-grouping sweep + margins-baseline refresh.
# 1. Kernel verification with a LONG budget (batch 6's run hit the 1500 s
#    timeout after all printed checks passed; the committed baseline still
#    lacks the block_dw margins).
# 2. FE_SPLIT=2 on the adopted stack (dual-issue hypothesis: the FE
#    kernels sit at ~59% of their MXU floor with the VPU epilogue
#    serialized; phase-grouped sub-blocks hand the scheduler independent
#    streams).
# 3. FE_SPLIT=2 + FE_TB=512 (bigger slabs = more in-flight independence).
# 4. Whisper-small remat ladder point: nothing_saveable vs the default
#    save_matmul_inputs (the FFN block changed the replay economics).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4g_runbook.log}
: > "$LOG"
run() { echo "=== ${EXTRA_ENV:-} $*" >> "$LOG"; timeout ${T:-1500} env ${EXTRA_ENV:-} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

T=2400 run python tools/verify_kernels.py --update-baseline

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block --attn-stats v2 --remat save_qk_ctx"
EXTRA_ENV="CORAL_FE_SPLIT=2" run python tools/bench_config.py $STACK
EXTRA_ENV="CORAL_FE_SPLIT=2 CORAL_FE_TB=512" run python tools/bench_config.py $STACK
run python tools/bench_whisper.py --steps 10 --ffn-block --grad-dtype bfloat16 --remat nothing_saveable
echo "PROBES DONE" >> "$LOG"
