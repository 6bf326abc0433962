#!/usr/bin/env bash
# Round-4 release-ladder top-ups, watchdog edition. Same targets as
# round4_train.sh, plus a per-rung stall watchdog: the shared-relay TPU
# can hang an in-flight RPC indefinitely (observed 2026-08-20 ~22:30: the
# a16 trainer slept 28 min with zero CPU until killed by hand, and the
# trainer's exception-based fault recovery never fires because nothing
# raises). If a rung's train_log.jsonl mtime stalls >900 s (normal gaps:
# ~80 s between log writes, a few minutes for save+eval and cold
# compile+restore), the rung is killed and retried — it resumes from its
# last save_every checkpoint, so a hang costs at most ~1k steps.
#
# Usage: bash scripts/round4_train2.sh [wait-pid] [deadline-epoch]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-0}
DEADLINE=${2:-$(( $(date +%s) + 14400 ))}
LOG=artifacts/round4_train.log

train_rung() {
  local ckpt=$1 alpha=$2 target=$3 lr=$4
  local tries=0 rc=0
  while [ "$tries" -lt 4 ]; do
    tries=$((tries + 1))
    local left=$((DEADLINE - $(date +%s)))
    if [ "$left" -lt 600 ]; then
      echo "[4t] skip $ckpt (only ${left}s left)"
      return
    fi
    local cur
    cur=$(grep -o '"step": [0-9]*' "$ckpt/train_log.jsonl" 2>/dev/null \
          | tail -1 | grep -o '[0-9]*' || echo 0)
    if [ "${cur:-0}" -ge "$target" ]; then
      echo "[4t] $ckpt already at $cur >= $target"
      break
    fi
    echo "[4t] $(date -u +%H:%M:%S) $ckpt -> $target steps (lr $lr, try $tries)"
    python -m pcgcv1_tpu.cli train \
      --data 'data/corpus/*.npz' --mode hyper --modelname voxception \
      --batch_size 32 --dtype bfloat16 --save_every 1000 --cube_size 64 \
      --beta 3 --lr_schedule constant --quant ste --lr "$lr" \
      --est_lr 5e-3 --alpha "$alpha" --num_iteration "$target" \
      --ckpt_dir "$ckpt" &
    local pid=$! start
    start=$(date +%s)
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local now mt
      now=$(date +%s)
      mt=$(stat -c %Y "$ckpt/train_log.jsonl" 2>/dev/null || echo "$start")
      [ "$mt" -lt "$start" ] && mt=$start
      if [ $((now - mt)) -gt 900 ]; then
        echo "[4t] $ckpt stalled $((now - mt))s (hung relay?); killing $pid"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ "$now" -gt $((DEADLINE - 120)) ]; then
        echo "[4t] deadline reached; stopping $ckpt"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        return
      fi
    done
    wait "$pid" 2>/dev/null; rc=$?
    if [ "$rc" -eq 0 ]; then
      break
    fi
    echo "[4t] $ckpt rc=$rc (try $tries)"
  done
  grep eval_loss "$ckpt/train_log.jsonl" 2>/dev/null | tail -1
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
} >> "$LOG" 2>&1

git add -A checkpoints/r2_a16b3 checkpoints/r2_a6b3 checkpoints/r2_a2b3 \
  checkpoints/r2_a0.75b3 "$LOG"
git commit -m "Round-4 release-ladder STE top-ups (a16->30k, a6->17k, a2->16k, a0.75->11.5k steps)" \
  || echo "[4t] commit failed or nothing to commit" >> "$LOG"
