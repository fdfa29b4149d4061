#!/bin/bash
# Round-4 TPU batch 4: compose on top of the adopted ffn_block +
# save_attn_ctx stack (905.3 at B=48, r4c batch 3).
# 1. Kernel verification incl. the new save_stats v2 checks.
# 2. Control re-measure of the adopted defaults (now ffn_block +
#    save_attn_ctx — bench_config flags spell them out regardless).
# 3. attention save_stats v2 under nothing_saveable (isolates the
#    one-pass p rebuild vs the 892.9 nothing_saveable point).
# 4. attention save_stats v2 + save_attn_ctx_lse (the composition that
#    both DCEs the attention fwd from the replay AND keeps the one-pass
#    rebuild; compare against 905.3).
# 5. Whisper-small ffn_block A/B (adopted whisper stack = control 1374.5).
# 6. Encoder scan unroll=2 on the adopted stack (fewer DUS round-trips;
#    the r3 unroll probe predates the fused kernels), long compile budget.
# 7. B=64 retry (nothing_saveable — save_attn_ctx adds ~1.5 GB at B=64),
#    long compile budget; r4c's attempt died on a remote-compile flake.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4d_runbook.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout ${T:-1500} "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

run python tools/verify_kernels.py --update-baseline

STACK="--steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --ffn-block"
run python tools/bench_config.py $STACK --remat save_attn_ctx
run python tools/bench_config.py $STACK --attn-stats v2
run python tools/bench_config.py $STACK --attn-stats v2 --remat save_attn_ctx_lse
run python tools/bench_whisper.py --steps 10 --ffn-block --grad-dtype bfloat16
T=2400 run python tools/bench_config.py $STACK --remat save_attn_ctx --unroll 2
T=2400 run python tools/bench_config.py $STACK --batch 64
echo "PROBES DONE" >> "$LOG"
