#!/bin/bash
# Round-5 batch 8: closure measurements.
#  1. e2e accounting separation: the loop bench counts true clip seconds
#     (9-9.9 s avg 9.45) while the step bench counts 10 s/sample — run the
#     loop at exact 10 s clips so the residual loop-vs-step gap isolates
#     genuine host overhead from the clip-length accounting markdown.
#  2. Clean idle-host generate re-measures (the r5e ones ran concurrently
#     with a 32-min CPU pytest suite and are contaminated).
#  3. whisper-large pallas-LN A/B (rejected on small at d=768; the d=1280
#     regime may differ).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5h_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

# Decode batch-blocking regression A/B: bench.py's generate fields went
# 553.6 -> 676.6 ms greedy / 884.9 -> 1055.3 beam between r4 and r5, and
# the commit timeline points at the batch-blocked decode kernels (r5b's
# clean 560/846 predate that commit). CORAL_DECODE_BB_MB=0 restores one
# batch row per grid step.
run_bb() { echo "=== CORAL_DECODE_BB_MB=$1 ${*:2}" >> "$LOG"; CORAL_DECODE_BB_MB=$1 timeout ${T:-2400} "${@:2}" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }
run_bb 0  python tools/bench_generate.py --beams 1
run_bb 0  python tools/bench_generate.py --beams 5
run_bb 48 python tools/bench_generate.py --beams 1
run_bb 48 python tools/bench_generate.py --beams 5
run_bb 8  python tools/bench_generate.py --beams 5

run python tools/bench_e2e.py --clips 10-10
run python tools/bench_whisper.py --arch large_v3_turbo --steps 8 --ffn-block-dg --grad-dtype bfloat16 --batch 8 --remat save_flash_ctx --ln pallas
echo "PROBES DONE" >> "$LOG"
