#!/usr/bin/env bash
# Round-3e evidence chain (fresh session after the 3d VM restart):
# 1. wait for the running STE fine-tune of r3_simple_a2;
# 2. STE-finish r3_simple_a16 (the other rounding-collapsed rung);
# 3. run the FULL gated ablation sweep (all six variants) on the vox10
#    composite — the committed ablation_bd.csv is still the invalid
#    round-2 table (VERDICT r2 Missing #1);
# 4. commit the results.
#
# Usage: bash scripts/round3e_chain.sh <ste-a2-pid> <deadline-epoch>
set -u
cd "$(dirname "$0")/.."
A2_PID=${1:?ste-a2 pid}
DEADLINE=${2:?deadline epoch}
LOG=artifacts/round3e_chain.log

{
  echo "[3e] $(date -u +%H:%M:%S) waiting on STE a2 pid $A2_PID"
  while kill -0 "$A2_PID" 2>/dev/null; do sleep 10; done
  echo "[3e] $(date -u +%H:%M:%S) STE a2 done"

  if [ $((DEADLINE - $(date +%s))) -gt 2000 ]; then
    echo "[3e] $(date -u +%H:%M:%S) STE fine-tune r3_simple_a16 (-> 5500)"
    timeout 420 python -m pcgcv1_tpu.cli train \
      --data 'data/corpus/*.npz' --mode factorized --modelname simple \
      --batch_size 32 --dtype bfloat16 --save_every 500 --cube_size 64 \
      --beta 3 --lr_schedule cosine --quant ste --lr 5e-5 --est_lr 5e-3 \
      --alpha 16 --num_iteration 5500 \
      --ckpt_dir checkpoints/r3_simple_a16 || true
  else
    echo "[3e] SKIP STE a16 (deadline)"
  fi

  echo "[3e] $(date -u +%H:%M:%S) ablation sweep (deadline $DEADLINE)"
  python -m pcgcv1_tpu.cli ablate \
    --input artifacts/composite_vox10.ply \
    --out artifacts/ablations \
    --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
    --factorized_ladder checkpoints/r3_fact_a2,checkpoints/r3_fact_a16 \
    --simple_ladder checkpoints/r3_simple_a2,checkpoints/r3_simple_a16 \
    --res 1024 --chunk 96 --dtype bfloat16 --extra_scales 0.625 \
    --deadline "$((DEADLINE - 120))" || echo "[3e] ablate rc=$?"

  echo "[3e] $(date -u +%H:%M:%S) committing ablation artifacts"
  git add -A artifacts/ablations checkpoints/r3_simple_a2 \
      checkpoints/r3_simple_a16 artifacts/round3e_chain.log 2>/dev/null
  git commit -m "Round-3e ablation sweep: STE-finished simple rungs, gated BD table" \
      >/dev/null 2>&1 || echo "[3e] nothing to commit"
  echo "[3e] $(date -u +%H:%M:%S) chain done"
} >> "$LOG" 2>&1
