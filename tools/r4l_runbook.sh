#!/bin/bash
# Round-4 TPU batch 12: the dg-in-kernel block backward — the IO
# accounting of the final profile shows the backward kernel is partly
# DMA-bound; computing dg = dy @ W2^T inside it swaps a 196 MB/layer
# read for a 49 MB one and removes the outside dg matmul's 196 MB write.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4l_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --attn-stats v2 --remat save_qk_ctx"
run python tools/bench_config.py $STACK --ffn-block-dg
run python tools/bench_config.py $STACK --ffn-block
run python tools/bench_whisper.py --steps 10 --grad-dtype bfloat16 --ffn-block-dg
echo "PROBES DONE" >> "$LOG"
