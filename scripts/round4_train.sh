#!/usr/bin/env bash
# Round-4 release-ladder top-ups (round-3 VERDICT item 6: scale rungs
# toward reference training discipline). Continues each release rung IN
# PLACE (the rd_release INIs keep pointing at the same dirs) with the
# validated recipe: STE (rounding-aware) at constant lr, batch 32, fast
# factorized-density optimizer. Targets (from current steps; trimmed to
# ~19.5k total steps = ~4.3h at the measured 1.26 steps/s so the eval
# re-sweep still fits in the round; a16 runs FIRST — the top rung sets
# the ladder's quality ceiling and the D1 spread):
#   r2_a16b3   23.0k -> 30k
#   r2_a6b3    12.0k -> 17k
#   r2_a2b3    11.5k -> 16k
#   r2_a0.75b3  8.5k -> 11.5k (lr 1e-5: low-alpha STE is the fragile one)
#
# MUST NOT run concurrently with an eval sweep over the same checkpoints
# (rate points restore `latest` — mid-sweep updates would mix rungs).
#
# Usage: bash scripts/round4_train.sh [wait-pid] [deadline-epoch]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-0}
DEADLINE=${2:-$(( $(date +%s) + 14400 ))}
LOG=artifacts/round4_train.log

train_rung() {
  local ckpt=$1 alpha=$2 target=$3 lr=$4
  local left=$((DEADLINE - $(date +%s)))
  if [ "$left" -lt 600 ]; then
    echo "[4t] skip $ckpt (only ${left}s left)"
    return
  fi
  echo "[4t] $(date -u +%H:%M:%S) $ckpt -> $target steps (lr $lr)"
  timeout "$((left - 120))" python -m pcgcv1_tpu.cli train \
    --data 'data/corpus/*.npz' --mode hyper --modelname voxception \
    --batch_size 32 --dtype bfloat16 --save_every 1000 --cube_size 64 \
    --beta 3 --lr_schedule constant --quant ste --lr "$lr" \
    --est_lr 5e-3 --alpha "$alpha" --num_iteration "$target" \
    --ckpt_dir "$ckpt" || echo "[4t] $ckpt rc=$?"
  grep eval_loss "$ckpt/train_log.jsonl" | tail -1
}

{
  if [ "$WAIT_PID" != 0 ]; then
    echo "[4t] $(date -u +%H:%M:%S) waiting on pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  fi
  train_rung checkpoints/r2_a16b3  16   30000 2e-5
  train_rung checkpoints/r2_a6b3   6    17000 2e-5
  train_rung checkpoints/r2_a2b3   2    16000 2e-5
  train_rung checkpoints/r2_a0.75b3 0.75 11500 1e-5
  echo "[4t] $(date -u +%H:%M:%S) done"
} > "$LOG" 2>&1

git add -A checkpoints/r2_a16b3 checkpoints/r2_a6b3 checkpoints/r2_a2b3 \
  checkpoints/r2_a0.75b3 "$LOG"
git commit -m "Round-4 release-ladder STE top-ups (a16->30k, a6->17k, a2->16k, a0.75->11.5k steps)" \
  || echo "[4t] commit failed or nothing to commit" >> "$LOG"
