#!/bin/bash
# Round-4 TPU batch 13: flash-attention residual saving. The whisper
# encoder's flash VJP recomputed its forward inside the backward AND the
# remat replay re-ran it (attn_ctx was named on a post-reshape value —
# the round-3 trap, found in whisper's profile as two ~24 ms checkpoint
# blobs). The kernel now names (o, l, m) on its residual vars and
# save_matmul_inputs saves them.
# 1. Kernel verification (the flash section now grads through the
#    residual-fed backward).
# 2. Whisper-small default stack (residual saving is on by default under
#    save_matmul_inputs) vs the 1415.8 control.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4m_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py
run python tools/bench_whisper.py --steps 10 --ffn-block-dg --grad-dtype bfloat16
echo "PROBES DONE" >> "$LOG"
