#!/usr/bin/env bash
# Round-3 training chain, part 3: ladder monotonicity (VERDICT r2 next
# item 3). The r2 a2/a6/a16 hyper rungs are undertrained (6k-19k steps)
# and on the synthetic sequence are all dominated by a0.75; extend each
# with a cosine top-up, then the round-2c STE (rounding-aware) finish
# that every rung needs before a release sweep.
#
# Usage: bash scripts/round3c_chain.sh <deadline-epoch-seconds>
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?pass a unix-epoch deadline}
LOG=artifacts/round3_chain.log

have_time() { [ $((DEADLINE - $(date +%s))) -gt "$1" ]; }

stage() { # name est-seconds timeout-seconds cmd...
  local name=$1 est=$2 to=$3
  shift 3
  if ! have_time "$est"; then
    echo "[chain] $(date -u +%H:%M:%S) SKIP $name (deadline)"
    return 0
  fi
  echo "[chain] $(date -u +%H:%M:%S) START $name"
  timeout "$to" "$@" || echo "[chain] $name rc=$? (timeout or error)"
  echo "[chain] $(date -u +%H:%M:%S) END $name"
}

hyper=(--data "data/corpus/*.npz" --mode hyper --batch_size 32
       --dtype bfloat16 --save_every 500 --cube_size 64 --beta 3)

{
  # cosine top-ups (resume past the saved step; schedule-tolerant restore)
  stage E1_a2_ext 900 3000 python -m pcgcv1_tpu.cli train \
    "${hyper[@]}" --alpha 2 --lr_schedule cosine --lr 4e-5 \
    --num_iteration 12000 --ckpt_dir checkpoints/r2_a2b3

  stage E2_a16_ext 900 3000 python -m pcgcv1_tpu.cli train \
    "${hyper[@]}" --alpha 16 --lr_schedule cosine --lr 4e-5 \
    --num_iteration 22000 --ckpt_dir checkpoints/r2_a16b3

  # STE finish per rung (constant lr, short): matches train-time
  # quantization to decode-time rounding
  stage T1_a2_ste 600 1500 python -m pcgcv1_tpu.cli train \
    "${hyper[@]}" --alpha 2 --quant ste --lr_schedule constant --lr 2e-5 \
    --num_iteration 13000 --ckpt_dir checkpoints/r2_a2b3

  stage T2_a6_ste 600 1500 python -m pcgcv1_tpu.cli train \
    "${hyper[@]}" --alpha 6 --quant ste --lr_schedule constant --lr 2e-5 \
    --num_iteration 12000 --ckpt_dir checkpoints/r2_a6b3

  stage T3_a16_ste 600 1500 python -m pcgcv1_tpu.cli train \
    "${hyper[@]}" --alpha 16 --quant ste --lr_schedule constant --lr 2e-5 \
    --num_iteration 23000 --ckpt_dir checkpoints/r2_a16b3

  echo "[chain] $(date -u +%H:%M:%S) round3c chain done"
} >> "$LOG" 2>&1
