#!/usr/bin/env bash
# Round-3 training chain, part 2: resume after the VM restart killed
# round3_chain.sh mid-F2 (F1 completed to 3500 steps).
#
#   F2  factorized voxception a2   (resumes checkpoints/r3_fact_a2 @2300)
#   S1  factorized simple a16      (fresh, gain 24)
#   S2  factorized simple a2       (warm from S1 down the ladder)
#   L1  hyper a6 extension         (ladder monotonicity)
#
# Usage: bash scripts/round3b_chain.sh <deadline-epoch-seconds>
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?pass a unix-epoch deadline}
LOG=artifacts/round3_chain.log

have_time() { # est-seconds
  [ $((DEADLINE - $(date +%s))) -gt "$1" ]
}

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

common=(--data "data/corpus/*.npz" --mode factorized --batch_size 32
        --dtype bfloat16 --save_every 500 --cube_size 64 --beta 3
        --lr_schedule cosine --lr 1e-4 --eb_init_scale 4 --est_lr 5e-3)

{
  stage F2_fact_a2 600 1800 python -m pcgcv1_tpu.cli train \
    "${common[@]}" --alpha 2 --num_iteration 3500 --latent_gain 16 \
    --ckpt_dir checkpoints/r3_fact_a2 \
    --init_ckpt_dir checkpoints/r2_a2b3 --reset_optimizer 1

  stage S1_simple_a16 900 4200 python -m pcgcv1_tpu.cli train \
    "${common[@]}" --modelname simple --alpha 16 --num_iteration 4500 \
    --latent_gain 24 --eb_init_scale 8 \
    --ckpt_dir checkpoints/r3_simple_a16

  stage S2_simple_a2 900 2600 python -m pcgcv1_tpu.cli train \
    "${common[@]}" --modelname simple --alpha 2 --num_iteration 2500 \
    --ckpt_dir checkpoints/r3_simple_a2 \
    --init_ckpt_dir checkpoints/r3_simple_a16 --reset_optimizer 1

  stage L1_hyper_a6 900 4200 python -m pcgcv1_tpu.cli train \
    --data "data/corpus/*.npz" --mode hyper --batch_size 32 \
    --dtype bfloat16 --save_every 500 --cube_size 64 --beta 3 \
    --lr_schedule cosine --lr 4e-5 --alpha 6 --num_iteration 11000 \
    --ckpt_dir checkpoints/r2_a6b3

  echo "[chain] $(date -u +%H:%M:%S) chain done"
} >> "$LOG" 2>&1
