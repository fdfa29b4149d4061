#!/bin/bash
# Round-5 batch 4: whisper-large-v3-turbo batch/remat frontier, part 2
# (VERDICT r4 #3). save_matmul_inputs OOMs at B=6 by 2.41G / B=8 by 5.08G;
# the new save_flash_ctx policy keeps ~2 saved (B,T,D) tensors/layer
# instead of 7+, and nothing_saveable only the scan carries.
# Also: profile the best large-turbo config for the budget table, and the
# whisper-small headline B sweep point left from r4.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5d_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

WT="python tools/bench_whisper.py --arch large_v3_turbo --steps 8 --ffn-block-dg --grad-dtype bfloat16"

run $WT --batch 8 --remat save_flash_ctx
run $WT --batch 8 --remat nothing_saveable
run $WT --batch 6 --remat save_flash_ctx
run $WT --batch 4 --remat save_flash_ctx
run $WT --batch 12 --remat nothing_saveable
echo "PROBES DONE" >> "$LOG"
