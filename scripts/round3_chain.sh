#!/usr/bin/env bash
# Round-3 training chain: the rungs the ablation table still needs
# (VERDICT round 2, Missing #1), sized to the remaining round budget.
#
# All factorized rungs use the latent-gain warm-start reparameterization
# (train.py) — round 2's from-scratch factorized runs spent their whole
# budget growing latents past integer quantization (100+ bpp starts).
#
#   F1  factorized voxception a16  (warm from hyper r2_a16b3, gain 8)
#   F2  factorized voxception a2   (warm from hyper r2_a2b3, gain 16)
#   S1  factorized simple a16      (fresh, gain 24)
#   S2  factorized simple a2       (warm from S1 down the ladder)
#   L1  hyper a6 extension         (ladder monotonicity) — only if time
#
# Usage: bash scripts/round3_chain.sh <deadline-epoch-seconds>
# Each stage is skipped if the deadline has fewer seconds left than its
# floor estimate.
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
  stage F1_fact_a16 900 3300 python -m pcgcv1_tpu.cli train \
    "${common[@]}" --alpha 16 --num_iteration 3500 --latent_gain 8 \
    --ckpt_dir checkpoints/r3_fact_a16 \
    --init_ckpt_dir checkpoints/r2_a16b3 --reset_optimizer 1

  stage F2_fact_a2 900 3300 python -m pcgcv1_tpu.cli train \
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

  stage L1_hyper_a6 900 2700 python -m pcgcv1_tpu.cli train \
    --data "data/corpus/*.npz" --mode hyper --batch_size 32 \
    --dtype bfloat16 --save_every 500 --cube_size 64 --beta 3 \
    --lr_schedule cosine --lr 4e-5 --alpha 6 --num_iteration 11000 \
    --ckpt_dir checkpoints/r2_a6b3

  echo "[chain] $(date -u +%H:%M:%S) chain done"
} >> "$LOG" 2>&1
