#!/bin/bash
# Round-5 batch 2: whisper-large-v3-turbo optimization pass (VERDICT r4 #3)
# + beam-5 decode profile (VERDICT r4 #6).
#   - large_v3_turbo: batch x remat frontier sweep at the adopted FFN stack
#     (is B=4 under save_matmul_inputs really the frontier?)
#   - profile one step of the B/remat winner for the budget table
#   - profile greedy vs beam-5 whisper-small generation for the latency gap
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5b_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

WT="python tools/bench_whisper.py --arch large_v3_turbo --steps 8 --ffn-block-dg --grad-dtype bfloat16"

run $WT --batch 4
run $WT --batch 4 --remat nothing_saveable
run $WT --batch 6
run $WT --batch 8
run $WT --batch 6 --remat nothing_saveable

run python tools/bench_generate.py --beams 1 --profile-dir /tmp/r5_greedy_trace
run python tools/bench_generate.py --beams 5 --profile-dir /tmp/r5_beam_trace
echo "PROBES DONE" >> "$LOG"
