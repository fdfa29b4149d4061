#!/bin/bash
# Round-5 batch 9: decode regression closure. BB=0 with the conditional
# compiler params (the unconditional 112 MB vmem_limit was part of the
# regression hypothesis) — target: restore the pre-batch-blocking
# 560/846 ms generate latencies.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5i_runbook.log}
: > "$LOG"
run_bb() { echo "=== CORAL_DECODE_BB_MB=$1 ${*:2}" >> "$LOG"; CORAL_DECODE_BB_MB=$1 timeout ${T:-2400} "${@:2}" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run_bb 0 python tools/bench_generate.py --beams 1
run_bb 0 python tools/bench_generate.py --beams 5
echo "PROBES DONE" >> "$LOG"
