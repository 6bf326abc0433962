#!/usr/bin/env bash
# Round-2 continuation chain: after the STE ladder fine-tune releases the
# chip, refresh every TPU-dependent artifact in value order, committing
# after each stage so progress survives an interrupted session:
#   1. release R-D sweep (synth_vox10 with rho re-search + held-out
#      composite_vox10 reusing cached rhos) + BD report
#   2. bench JSON with the refreshed release checkpoint
#   3. mask-wire x VRN A/B bench legs
#   4. ablation table over the variants that need no extra training
#      (cube 32/128, fixed threshold, plus any trained model variants)
#
# Usage: bash scripts/round2c_chain.sh [ste-chain-pid]
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/round2c_chain.log
PID=${1:-}

commit() { # message
  git add -A
  git commit -q -m "$1" || true
}

{
  if [ -n "$PID" ]; then
    echo "[chain] $(date -u +%H:%M:%S) waiting on STE pid $PID"
    while kill -0 "$PID" 2>/dev/null; do sleep 30; done
  fi
  commit "STE fine-tune of the a2/a6/a16 rungs (rounding-aware pass down the ladder)"

  echo "[chain] $(date -u +%H:%M:%S) release sweep (both sequences)"
  # composite: reuse the cached rho winners (a fresh search costs ~8
  # pc_error calls/point at 26 s each on the 3M-point cloud)
  SKIP_STE_FT=1 EVAL_FLAGS_COMPOSITE="" bash scripts/eval_release.sh
  echo "[chain] $(date -u +%H:%M:%S) report"
  python -m pcgcv1_tpu.cli report --eval_dir artifacts/rd_release \
    --inputs_dir artifacts --res 1024
  commit "Release R-D refresh after STE ladder pass; add held-out composite sequence"

  echo "[chain] $(date -u +%H:%M:%S) bench"
  python bench.py > artifacts/BENCH_round2c.json || true
  cat artifacts/BENCH_round2c.json
  commit "Bench refresh with STE-tuned release checkpoint"

  echo "[chain] $(date -u +%H:%M:%S) A/B legs"
  bash scripts/ab_bench.sh
  commit "Mask-wire x VRN A/B bench results"

  echo "[chain] $(date -u +%H:%M:%S) ablations (no-extra-training variants)"
  python -m pcgcv1_tpu.cli ablate \
    --input artifacts/synth_vox10.ply \
    --out artifacts/ablations \
    --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
    --res 1024 --cube_size 64 --chunk 64 --dtype bfloat16 || true
  commit "Ablation tables: cube size and threshold-mode comparisons"

  echo "[chain] $(date -u +%H:%M:%S) factorized rungs for the model ablations"
  fcommon="--data 'data/corpus/*.npz' --mode factorized --batch_size 32 \
    --dtype bfloat16 --save_every 500 --cube_size 64 --lr 1e-4 \
    --lr_schedule cosine --num_iteration 4000 --beta 3"
  eval timeout 1500 python -m pcgcv1_tpu.cli train $fcommon --alpha 16 \
    --ckpt_dir checkpoints/r2_factorized_voxception_a16 || true
  eval timeout 2400 python -m pcgcv1_tpu.cli train $fcommon --alpha 2 \
    --ckpt_dir checkpoints/r2_factorized_voxception_a2 \
    --init_ckpt_dir checkpoints/r2_a2b3 --reset_optimizer 1 || true
  commit "Train factorized-voxception ablation rungs (alpha 16 resume, alpha 2 warm start)"

  echo "[chain] $(date -u +%H:%M:%S) ablations incl. hyper-vs-factorized"
  python -m pcgcv1_tpu.cli ablate \
    --input artifacts/synth_vox10.ply \
    --out artifacts/ablations \
    --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
    --factorized_ladder checkpoints/r2_factorized_voxception_a2,checkpoints/r2_factorized_voxception_a16 \
    --res 1024 --cube_size 64 --chunk 64 --dtype bfloat16 || true
  commit "Ablation tables: add hyper-vs-factorized comparison"
  echo "[chain] $(date -u +%H:%M:%S) chain done"
} >> "$LOG" 2>&1
