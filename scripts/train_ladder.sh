#!/usr/bin/env bash
# Round-2 release training: a 4-point R-D ladder on the diversified mesh
# corpus (scripts/make_corpus.py), reference alphas {0.75, 2, 6, 16}
# (eval_ablation_studies.py:71-77), warm-started down the ladder the way
# the reference trains its rate points.
#
# Phase A trains the highest-quality point long with warmup-cosine from
# 1e-4 (the reference's own earlier recipe, train_hyper.py:101); B-D
# fine-tune down the ladder at 4e-5. Each phase is wall-clock-bounded by
# `timeout`; checkpoints save every 1000 steps so <=13 min is at risk.
#
# Usage: bash scripts/train_ladder.sh [phaseA-seconds] [finetune-seconds]
set -u
A=${1:-14400}
F=${2:-6300}
cd "$(dirname "$0")/.."

common="--data 'data/corpus/*.npz' --mode hyper --batch_size 32 \
  --dtype bfloat16 --save_every 1000 --cube_size 64 --lr_schedule cosine"

run() { # alpha iters lr warmstart seconds
  local alpha=$1 iters=$2 lr=$3 init=$4 secs=$5
  echo "[ladder] alpha=$alpha for ${secs}s (init=$init)"
  eval timeout "$secs" python -m pcgcv1_tpu.cli train $common \
    --alpha "$alpha" --beta 3 --num_iteration "$iters" --lr "$lr" \
    --ckpt_dir "checkpoints/r2_a${alpha}b3" \
    ${init:+--init_ckpt_dir "$init" --reset_optimizer 1} || true
}

run 16   19000 1e-4 checkpoints/hyper_a6b3 "$A"
run 6     8000 4e-5 checkpoints/r2_a16b3   "$F"
run 2     8000 4e-5 checkpoints/r2_a6b3    "$F"
run 0.75  8000 4e-5 checkpoints/r2_a2b3    "$F"
echo "[ladder] done"
