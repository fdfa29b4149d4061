#!/bin/bash
# Round-3 continuation, batch 3: whisper-side A/Bs of the kernels that
# measured positive on the wav2vec2 stack (fused FFN / LN fold / pallas LN /
# bf16 grad buffers were never A/B'd on the whisper step).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3d_probes.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout 1500 "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

# save_ctx_act OOMs at B=48 (needs 16.96 GB); retry at B=40 where the saved
# attn_ctx+ffn_act tensors (~4.9 GB) fit
run python tools/bench_config.py --steps 12 --batch 40 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --remat save_ctx_act
run python tools/bench_config.py --steps 12 --batch 40 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16
run python tools/bench_whisper.py --steps 10
run python tools/bench_whisper.py --steps 10 --fused-ffn-ln
run python tools/bench_whisper.py --steps 10 --fused-ffn-ln --grad-dtype bfloat16
run python tools/bench_whisper.py --steps 10 --fused-ffn-ln --grad-dtype bfloat16 --ln pallas
echo "PROBES DONE" >> "$LOG"
