#!/usr/bin/env bash
# Round-5 release-ladder training. Priorities (VERDICT round-4 item 2):
#   1. a0.75 — the scale-1 workhorse (feeds R1-R4 of every release curve)
#      sits at 8.5k steps; cosine-restart STE run toward 25k.
#   2. a2 / a6 / a16 — constant-lr STE top-ups (validated recipe).
# The z-stream bloat (z/y ~0.95 in-training vs reference 0.58) is
# high-entropy z, not estimator misfit (est_lr 5e-3 has been on since
# round 4), so the fix is full-gradient steps with gamma=1 pressure.
#
# Controls:
#   touch artifacts/round5_train.STOP   -> clean stop (between checks)
#   watchdog: train_log.jsonl mtime stall >900 s -> kill + resume rung
#
# Exit-status contract (VERDICT round-4 weak #6): every trainer exit is
# logged as "rc=N"; a rung that exhausts its retries marks the chain
# FAILED and the script exits nonzero.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 25200 ))}   # default now+7h
LOG=artifacts/round5_train.log
STOP=artifacts/round5_train.STOP
CHAIN_RC=0

cur_step() {
  grep -o '"step": [0-9]*' "$1/train_log.jsonl" 2>/dev/null \
    | tail -1 | grep -o '[0-9]*' || echo 0
}

train_rung() {
  local ckpt=$1 alpha=$2 target=$3; shift 3
  local extra=("$@")
  local tries=0 rc=0
  while [ "$tries" -lt 5 ]; do
    tries=$((tries + 1))
    if [ -e "$STOP" ]; then echo "[5t] STOP file present; ending"; return 0; fi
    local left=$((DEADLINE - $(date +%s)))
    if [ "$left" -lt 600 ]; then
      echo "[5t] skip $ckpt (only ${left}s left)"; return 0
    fi
    local cur; cur=$(cur_step "$ckpt")
    if [ "${cur:-0}" -ge "$target" ]; then
      echo "[5t] $ckpt already at $cur >= $target"; return 0
    fi
    echo "[5t] $(date -u +%H:%M:%S) $ckpt $cur -> $target steps (try $tries; ${extra[*]})"
    python -m pcgcv1_tpu.cli train \
      --data 'data/corpus/*.npz' --mode hyper --modelname voxception \
      --batch_size 32 --dtype bfloat16 --save_every 1000 --cube_size 64 \
      --beta 3 --quant ste --est_lr 5e-3 --alpha "$alpha" \
      --num_iteration "$target" --ckpt_dir "$ckpt" "${extra[@]}" &
    local pid=$! start
    start=$(date +%s)
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local now mt
      now=$(date +%s)
      mt=$(stat -c %Y "$ckpt/train_log.jsonl" 2>/dev/null || echo "$start")
      [ "$mt" -lt "$start" ] && mt=$start
      if [ $((now - mt)) -gt 900 ]; then
        echo "[5t] $ckpt stalled $((now - mt))s (hung relay?); killing $pid"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        break
      fi
      if [ -e "$STOP" ] || [ "$now" -gt $((DEADLINE - 120)) ]; then
        echo "[5t] stop/deadline; halting $ckpt"
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        wait "$pid" 2>/dev/null
        return 0
      fi
    done
    wait "$pid" 2>/dev/null; rc=$?
    echo "[5t] $ckpt trainer exit rc=$rc (try $tries, step $(cur_step "$ckpt"))"
    if [ "$rc" -eq 0 ]; then
      grep eval_loss "$ckpt/train_log.jsonl" 2>/dev/null | tail -1
      return 0
    fi
  done
  echo "[5t] FAILED: $ckpt exhausted retries (last rc=$rc)"
  CHAIN_RC=1
  return 1
}

{
  echo "[5t] $(date -u +%H:%M:%S) chain start, deadline $(date -u -d "@$DEADLINE" +%H:%M:%S)"
  train_rung checkpoints/r2_a0.75b3 0.75 25000 \
    --lr 5e-5 --lr_schedule cosine --warmup_steps 300 --lr_final 2e-6
  train_rung checkpoints/r2_a2b3   2  22000 --lr 2e-5 --lr_schedule constant
  train_rung checkpoints/r2_a6b3   6  21000 --lr 2e-5 --lr_schedule constant
  train_rung checkpoints/r2_a16b3  16 34000 --lr 2e-5 --lr_schedule constant
  echo "[5t] $(date -u +%H:%M:%S) chain done rc=$CHAIN_RC"
} >> "$LOG" 2>&1
exit "$CHAIN_RC"
