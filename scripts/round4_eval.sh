#!/usr/bin/env bash
# Round-4 final evidence chain: after the ladder top-ups finish, re-sweep
# the release sequences with the UPDATED checkpoints (cached rho, no
# search — rho is a free parameter, cached winners are conservative),
# then regenerate the gated BD report against all three anchors (native
# octree, real G-PCC octree, real G-PCC trisoup — anchor caches are warm)
# and commit the artifacts.
#
# Usage: bash scripts/round4_eval.sh [wait-pid] [deadline-epoch]
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-0}
DEADLINE=${2:-$(( $(date +%s) + 10800 ))}
LOG=artifacts/round4_eval.log

{
  if [ "$WAIT_PID" != 0 ]; then
    echo "[4e] $(date -u +%H:%M:%S) waiting on pid $WAIT_PID"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "[4e] $(date -u +%H:%M:%S) trainer done"
  fi

  # re-sweep with final weights; INI regen inside eval_release.sh keeps
  # cached rho for unchanged (scale, ckpt_dir) sections
  SKIP_STE_FT=1 EVAL_FLAGS=" " timeout $((DEADLINE - $(date +%s) - 900)) \
    bash scripts/eval_release.sh || echo "[4e] eval rc=$?"

  echo "[4e] $(date -u +%H:%M:%S) report"
  timeout 1800 python -m pcgcv1_tpu.cli report \
    --eval_dir artifacts/rd_release --inputs_dir artifacts --res 1024 \
    || echo "[4e] report rc=$?"
  echo "[4e] $(date -u +%H:%M:%S) done"
} > "$LOG" 2>&1

git add artifacts/rd_release artifacts/rd_release.ini \
  artifacts/rd_release_composite.ini artifacts/rd_release_revolution.ini \
  "$LOG"
git commit -m "Round-4 release re-sweep on the topped-up ladder; BD report vs native octree + real G-PCC octree/trisoup" \
  || echo "[4e] commit failed or nothing to commit" >> "$LOG"
