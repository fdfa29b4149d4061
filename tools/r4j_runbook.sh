#!/bin/bash
# Round-4 TPU batch 10: fc2 folded into the block's FORWARD kernel — the
# forward's g write (+ fc2's g read, ~12 ms/step) disappears; backward
# unchanged. Then a fresh profile of whichever stack stands.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4j_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --attn-stats v2 --remat save_qk_ctx"
run python tools/bench_config.py $STACK --ffn-block-fc2
run python tools/bench_config.py $STACK --ffn-block
run python tools/bench_whisper.py --steps 10 --ffn-block --grad-dtype bfloat16 --ffn-block-fc2
echo "PROBES DONE" >> "$LOG"
