#!/usr/bin/env bash
# Unattended round-2 artifact pipeline: wait for the training ladder to
# finish, then produce the release R-D sweep (with rho search), the
# BD-rate report vs the octree anchor, and the bench JSON — in that
# order, serialized on the single TPU chip.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/round2_night.log
mkdir -p artifacts
{
  echo "[night] $(date -u) waiting for ladder (pid $(cat /tmp/ladder.pid 2>/dev/null || echo '?'))"
  if [ -f /tmp/ladder.pid ]; then
    while kill -0 "$(cat /tmp/ladder.pid)" 2>/dev/null; do sleep 60; done
  fi
  echo "[night] $(date -u) ladder done; release eval"
  bash scripts/eval_release.sh
  echo "[night] $(date -u) eval done; report"
  python -m pcgcv1_tpu.cli report --eval_dir artifacts/rd_release \
    --inputs_dir artifacts --res 1024
  echo "[night] $(date -u) report done; bench"
  python bench.py > artifacts/BENCH_night.json
  cat artifacts/BENCH_night.json
  echo "[night] $(date -u) all done"
} >> "$LOG" 2>&1
