#!/bin/bash
# Round-5 batch 6: the whisper-large-v3-turbo treatment (VERDICT r4 #3) —
# remat x batch frontier with the new save_flash_ctx policy (keeps only the
# flash VJP residuals + attention contexts), a profile at the winner for
# the attribution table — and the e2e infeed arithmetic run (VERDICT r4 #5).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5f_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

WL="--arch large_v3_turbo --steps 8 --ffn-block-dg --grad-dtype bfloat16"
run python tools/bench_whisper.py $WL --batch 6 --remat save_flash_ctx
run python tools/bench_whisper.py $WL --batch 8 --remat save_flash_ctx
run python tools/bench_whisper.py $WL --batch 10 --remat save_flash_ctx
run python tools/bench_whisper.py $WL --batch 8 --remat nothing_saveable
run python tools/bench_whisper.py $WL --batch 10 --remat nothing_saveable

# Profile the frontier winner for the whisper-large attribution table.
run python tools/bench_whisper.py $WL --batch 8 --remat save_flash_ctx \
    --profile-dir /tmp/r5_wl_trace
run python tools/analyze_trace.py /tmp/r5_wl_trace

# e2e loop with the infeed-bytes accounting (synthetic source, real loop).
run python tools/bench_e2e.py

echo "PROBES DONE" >> "$LOG"
