#!/bin/bash
# Round-5 batch 1: adjudicate the short-GELU polynomial default that was
# swept into the round-4 snapshot commit (VERDICT r4, weak #1). A/B on
# hardware at the adopted stack, both model families:
#   w2v2:   B=48, ffn-block-dg, attn-stats v2, save_qk_ctx, bf16 mu+grad
#   whisper: small, ffn-block-dg, bf16 grad
# If short wins, keep the default and re-derive the parity tolerances from
# the documented poly error bound; if not, revert to f32.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5a_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --grad-dtype bfloat16 --ffn-block-dg --attn-stats v2 --remat save_qk_ctx"

CORAL_GELU_POLY=f32   run python tools/bench_config.py $STACK
CORAL_GELU_POLY=short run python tools/bench_config.py $STACK
CORAL_GELU_POLY=f32   run python tools/bench_whisper.py --steps 10 --ffn-block-dg --grad-dtype bfloat16
CORAL_GELU_POLY=short run python tools/bench_whisper.py --steps 10 --ffn-block-dg --grad-dtype bfloat16
echo "PROBES DONE" >> "$LOG"
