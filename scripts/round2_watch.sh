#!/usr/bin/env bash
# Unattended follow-on: wait for the artifact chain (pid $1) to finish,
# then spend the remaining round budget (until unix ts $2, minus a
# safety margin for the final bench/commit) fine-tuning the ladder via
# scripts/round2_extend.sh, which itself refreshes the release sweep,
# BD report, and bench JSON with the improved weights.
#
# Usage: bash scripts/round2_watch.sh <chain-pid> <round-end-unix-ts>
set -u
cd "$(dirname "$0")/.."
PID=$1 END=$2
LOG=artifacts/round2_watch.log
{
  echo "[watch] $(date -u +%H:%M:%S) waiting on chain pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 120; done
  now=$(date +%s)
  # extend refreshes eval+report+bench after its 4 rungs: reserve ~45min
  left=$(( END - now - 2700 ))
  per=$(( left / 4 ))
  if [ "$per" -lt 600 ]; then
    echo "[watch] $(date -u +%H:%M:%S) only ${left}s left; skip extend"
    exit 0
  fi
  # cap a rung at 1h: past the cosine schedules, constant-lr fine-tune
  # has diminishing returns and the refresh artifacts matter more
  [ "$per" -gt 3600 ] && per=3600
  echo "[watch] $(date -u +%H:%M:%S) chain done; extend ${per}s/rung"
  bash scripts/round2_extend.sh "$per"
  echo "[watch] $(date -u +%H:%M:%S) extend done"
} >> "$LOG" 2>&1
