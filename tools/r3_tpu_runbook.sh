#!/bin/bash
# Round-3 TPU measurement runbook — serialized single-chip runs, one config
# per process (an OOM/compile failure cannot poison the next). Run after any
# kernel change; each line appends a JSON result to the log.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_tpu_run.log}
: > "$LOG"
run() { echo "=== $*" >> "$LOG"; timeout 1200 "$@" >> "$LOG" 2>&1; echo "--- rc=$?" >> "$LOG"; }

# 1. Mosaic kernel parity (poly GELU + conv_ln_gelu + all production kernels)
run python tools/verify_kernels.py
# 2. wav2vec2 bench candidates (new default stack: fused FE + pallas LN + L0 matmul)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --grad-dtype bfloat16
run python tools/bench_config.py --steps 12 --mu-dtype bfloat16
# 2b. attention-bwd stats residual (pairs with nothing_saveable replay)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --attn-stats
# 2c. FE conv tile sweep (256 = round-3 default; bwd overflows VMEM at 512)
run env CORAL_FE_TB=384 python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16
run env CORAL_FE_TB=512 python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16
# 2d. one B=64 retry now bf16 grads free HBM (previous failure was the axon
# compile budget with dots_saveable/unroll confounders in the same batch)
run python tools/bench_config.py --steps 12 --batch 64 --mu-dtype bfloat16 --grad-dtype bfloat16
# 2e. modest scan unroll (4 blew the compile budget; 2 doubles the body only)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --unroll 2
# 2f. named-checkpoint remat at B=48 (the round-3 nothing_saveable win was
# only ever compared at matched batch once)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --remat save_matmul_inputs
# 2g. save only attn_ctx: skips the attention fwd-kernel replay (~11 ms) for
# ~49 MB/layer of traffic; keep --attn-stats OFF with this policy
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --remat save_attn_ctx
# 2h. fused FFN up-projection (matmul + GELU+dropout epilogue: the 4x-wide
# pre-activation never leaves VMEM — ops/ffn_pallas.py)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn --grad-dtype bfloat16
run env CORAL_FFN_TM=512 python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn
# 2i. candidate best stack: fused FFN + bf16 grads + attention lse residual
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn --grad-dtype bfloat16 --attn-stats
# 2j. LN folded into the fused FFN kernel (removes the pre-FFN LN kernels +
# the ffn_in round-trips; backward emits ln_out once for dW1)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn-ln
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --fused-ffn-ln --grad-dtype bfloat16 --attn-stats
# 2k. folded positional conv (space-to-depth factor 2: full MXU tiles for
# the 64-channel groups — profiled at 3x its flop floor unfolded)
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold
run python tools/bench_config.py --steps 12 --batch 48 --mu-dtype bfloat16 --pos-fold --fused-ffn-ln --grad-dtype bfloat16 --attn-stats
# 2l. end-to-end loop throughput (real finetune(): host batcher + double-
# buffered per-microbatch device_put prefetch) — the infeed-overlap artifact;
# compare against the matching step-bench rows above
run python tools/bench_e2e.py --batch 48 --steps 30 --n-clips 256
run python tools/bench_e2e.py --batch 48 --steps 30 --n-clips 256 --extra model.fused_ffn_ln=true model.pos_conv_fold=true grad_dtype=bfloat16
# 3. whisper step A/Bs (poly GELU landed; LN + bf16 grads flagged)
run python tools/bench_whisper.py --steps 8
run python tools/bench_whisper.py --steps 8 --ln pallas
run python tools/bench_whisper.py --steps 8 --ln pallas --grad-dtype bfloat16
run python tools/bench_whisper.py --steps 8 --ln pallas --grad-dtype bfloat16 --fused-ffn
run python tools/bench_whisper.py --steps 8 --ln pallas --grad-dtype bfloat16 --fused-ffn-ln
echo "RUNBOOK DONE" >> "$LOG"
