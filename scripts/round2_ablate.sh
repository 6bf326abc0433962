#!/usr/bin/env bash
# Round-2 ablation suite (reference eval_ablation_studies.py role):
# 1. quick factorized-voxception + factorized-simple rate pairs (warm /
#    scratch), wall-clock-bounded;
# 2. `cli ablate` over cube {32,64,128}, adaptive-vs-fixed threshold,
#    hyper-vs-factorized, voxception-vs-simple;
# 3. BD table artifacts/ablations/ablation_bd.csv.
#
# Usage: bash scripts/round2_ablate.sh [train-seconds-per-variant]
set -u
cd "$(dirname "$0")/.."
T=${1:-2400}

common="--data 'data/corpus/*.npz' --batch_size 32 --dtype bfloat16 \
  --save_every 500 --cube_size 64 --lr_schedule cosine"

run() { # mode model alpha iters lr init secs
  local mode=$1 model=$2 alpha=$3 iters=$4 lr=$5 init=$6 secs=$7
  local name="r2_${mode}_${model}_a${alpha}"
  echo "[ablate-train] $name for ${secs}s"
  eval timeout "$secs" python -m pcgcv1_tpu.cli train $common \
    --mode "$mode" --modelname "$model" --alpha "$alpha" --beta 3 \
    --num_iteration "$iters" --lr "$lr" \
    --ckpt_dir "checkpoints/$name" \
    ${init:+--init_ckpt_dir "$init" --reset_optimizer 1} || true
}

run factorized voxception 16 4000 1e-4 checkpoints/r2_a16b3 "$T"
run factorized voxception 2  4000 1e-4 checkpoints/r2_a2b3  "$T"
run factorized simple     16 6000 1e-4 ""                   "$T"
run factorized simple     2  6000 1e-4 checkpoints/r2_factorized_simple_a16 "$T"

python -m pcgcv1_tpu.cli ablate \
  --input artifacts/synth_vox10.ply \
  --out artifacts/ablations \
  --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
  --factorized_ladder checkpoints/r2_factorized_voxception_a2,checkpoints/r2_factorized_voxception_a16 \
  --simple_ladder checkpoints/r2_factorized_simple_a2,checkpoints/r2_factorized_simple_a16 \
  --res 1024 --cube_size 64 --chunk 64 --dtype bfloat16
echo "[ablate] done"
