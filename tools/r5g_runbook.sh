#!/bin/bash
# Round-5 batch 7: adopt-the-qb-default validation + the remaining probes.
#  1. verify_kernels --update-baseline — first hardware run that includes
#     the qb (in-kernel qkv bias) checks and the v3 stats margins; writes
#     tools/kernel_margins.json for the margin-regression gate.
#  2. bench.py — full headline at the adopted defaults (v3 + qb expected
#     ~973 audio-s/s from the A/B).
#  3. probe_score_pack.py — the d=64 score-matmul packing adjudication
#     (VERDICT r4 #2a): measures whether 2-head-packed K=128 contractions
#     beat per-head K=64, or confirm the output-rate floor.
#  4. scan-unroll boundary: unroll=24 (fully static layer indices) crashed
#     the axon compile helper; find where partial unroll stops compiling
#     and whether fewer loop iterations help at all.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5g_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline
run python bench.py
run python tools/probe_score_pack.py

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --grad-dtype bfloat16 --ffn-block-dg --remat save_qk_ctx --attn-stats v3 --qkv-bias"
run python tools/bench_config.py $STACK --unroll 4
run python tools/bench_config.py $STACK --unroll 8
run python tools/bench_config.py $STACK --unroll 12
echo "PROBES DONE" >> "$LOG"
