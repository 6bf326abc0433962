#!/usr/bin/env bash
# Round-2 extension: after the artifact chain (scripts/round2_resume.sh)
# finishes, spend leftover wall-clock continuing the ladder (constant
# low-lr fine-tune; the cosine schedules have completed), then refresh
# the release R-D sweep, BD report, and bench JSON with the improved
# weights. The a0.75 rung keeps rounding-aware (STE) quantization — its
# noise-relaxed form collapses under real rounding at low alpha.
#
# Usage: bash scripts/round2_extend.sh [seconds-per-rung]
set -u
cd "$(dirname "$0")/.."
T=${1:-2700}
LOG=artifacts/round2_extend.log
mkdir -p artifacts

common="--data 'data/corpus/*.npz' --mode hyper --batch_size 32 \
  --dtype bfloat16 --save_every 1000 --cube_size 64 \
  --lr 2e-5 --lr_schedule constant"

ft() { # alpha quant secs   (num_iteration is an absolute cap; the
  local alpha=$1 quant=$2 secs=$3   # timeout governs actual work)
  echo "[extend] $(date -u +%H:%M:%S) alpha=$alpha quant=$quant ${secs}s"
  eval timeout "$secs" python -m pcgcv1_tpu.cli train $common \
    --alpha "$alpha" --beta 3 --num_iteration 60000 --quant "$quant" \
    --ckpt_dir "checkpoints/r2_a${alpha}b3" || true
}

{
  ft 2    noise "$T"
  ft 6    noise "$T"
  ft 0.75 ste   "$T"
  ft 16   noise "$T"

  echo "[extend] $(date -u +%H:%M:%S) refresh release eval"
  SKIP_STE_FT=1 bash scripts/eval_release.sh
  echo "[extend] $(date -u +%H:%M:%S) report"
  python -m pcgcv1_tpu.cli report --eval_dir artifacts/rd_release \
    --inputs_dir artifacts --res 1024
  echo "[extend] $(date -u +%H:%M:%S) bench"
  python bench.py > artifacts/BENCH_extend.json
  cat artifacts/BENCH_extend.json
  echo "[extend] $(date -u +%H:%M:%S) all done"
} >> "$LOG" 2>&1
