#!/usr/bin/env bash
# Release-checkpoint training plan (round 1): continue the two existing
# rate points at batch 32 (small-batch 3D convs are ~3x less efficient on
# the MXU, PERF_NOTES.md), then warm-start a third rate point, giving a
# 3-point R-D ladder (reference uses alpha in {0.75, 2, 6, 16},
# eval_ablation_studies.py:71-77).
#
# Usage: bash scripts/train_release.sh [phase-seconds]
set -u
P=${1:-8400}
cd "$(dirname "$0")/.."

common="--data synthetic --mode hyper --batch_size 32 --dtype bfloat16 \
  --save_every 1250 --cube_size 64"

echo "[phase 1] continue hyper_a6b3 (alpha=6)"
timeout "$P" python -m pcgcv1_tpu.cli train $common \
  --alpha 6 --beta 3 --num_iteration 60000 \
  --ckpt_dir checkpoints/hyper_a6b3 || true

echo "[phase 2] continue hyper_a2b3 (alpha=2)"
timeout "$((P * 2 / 3))" python -m pcgcv1_tpu.cli train $common \
  --alpha 2 --beta 3 --num_iteration 60000 \
  --ckpt_dir checkpoints/hyper_a2b3 || true

echo "[phase 3] new rate point hyper_a12b3 (alpha=12), warm start"
timeout "$((P / 2))" python -m pcgcv1_tpu.cli train $common \
  --alpha 12 --beta 3 --num_iteration 8000 \
  --ckpt_dir checkpoints/hyper_a12b3 \
  --init_ckpt_dir checkpoints/hyper_a6b3 --reset_optimizer 1 || true

echo "[done]"
