#!/bin/bash
# Round-5 batch 10: FE-backward decomposition + ragged-only masking +
# phased-decode adjudication.
#  1. probe_fe_bwd.py decomposed the FE conv backward's cost on hardware
#     (layer-1 shape, B=48): dW section +9.3 ms, VPU epilogue +2.8 ms,
#     dvec ~0 — a large share is the per-block ragged masking that only
#     the LAST row-block of each batch row actually needs. The kernels
#     (conv_ln_gelu bwd, ffn _bwd_ln_epilogue) now branch on
#     t == t_last: interior blocks skip the iota/compare/where passes.
#     Numerics identical (interior masks were all-true) — pinned by the
#     existing interpret-mode parity suites + verify_kernels on hardware.
#  2. Phased decode (_decode_phases in models/whisper.py): the decode
#     kernels stream the whole self-cache every step, so greedy/beam run
#     in cache-length buckets (64, 128, ..., max_length) with zero-pads
#     between phases; ~2x less KV DMA on average. HF parity re-pinned on
#     CPU (19 tests). A/B here: CORAL_DECODE_PHASED=0 vs 1.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5j_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-2400} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py
STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --grad-dtype bfloat16 --ffn-block-dg --remat save_qk_ctx --attn-stats v3 --qkv-bias"
run python tools/bench_config.py $STACK

run env CORAL_DECODE_PHASED=0 python tools/bench_generate.py --beams 1
run env CORAL_DECODE_PHASED=0 python tools/bench_generate.py --beams 5
run env CORAL_DECODE_PHASED=1 python tools/bench_generate.py --beams 1
run env CORAL_DECODE_PHASED=1 python tools/bench_generate.py --beams 5
echo "PROBES DONE" >> "$LOG"
