#!/usr/bin/env bash
# Round-4 ablation sweep — run FIRST in the round (round-3 VERDICT item 1;
# this table has been open for three rounds).
#
# Differences from the round-3e attempt that deadlined inside hyper64:
#   - input is the 858k-point crop of the mesh-sampled composite
#     (longdress-scale): per-point cost drops ~3.5x vs the 3M composite;
#   - per-point time estimates recalibrated + scaled by cloud size, and
#     the eval harness stops BETWEEN rate points at the deadline;
#   - --reuse allows re-invocation to pick up completed variant CSVs.
#
# Usage: bash scripts/round4_ablate.sh [trainer-pid] [deadline-epoch]
set -u
cd "$(dirname "$0")/.."
TRAIN_PID=${1:-0}
DEADLINE=${2:-$(( $(date +%s) + 14400 ))}
LOG=artifacts/round4_ablate.log

{
  if [ "$TRAIN_PID" != 0 ]; then
    echo "[4a] $(date -u +%H:%M:%S) waiting on trainer pid $TRAIN_PID"
    while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 10; done
    echo "[4a] $(date -u +%H:%M:%S) trainer done; last eval:"
    grep eval_loss checkpoints/r4_simple_a16/train_log.jsonl | tail -2
  fi

  echo "[4a] $(date -u +%H:%M:%S) ablation sweep (deadline $DEADLINE)"
  # rc contract (round-4 VERDICT weak #6): log the REAL exit status and
  # abort on failure. (The round-4 run logged "rc=1" on a fully green
  # sweep because cli.main sys.exit()'d run_ablations' row list; cli.py
  # now normalizes handler returns and run_ablations returns 0/1.)
  python -m pcgcv1_tpu.cli ablate \
    --input artifacts/composite_crop_vox10.ply \
    --out artifacts/ablations \
    --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
    --factorized_ladder checkpoints/r3_fact_a2,checkpoints/r3_fact_a16 \
    --simple_ladder checkpoints/r3_simple_a2,checkpoints/r4_simple_a16 \
    --res 1024 --chunk 96 --dtype bfloat16 --extra_scales 0.5,0.625 \
    --reuse --deadline "$((DEADLINE - 120))"
  rc=$?
  echo "[4a] ablate rc=$rc"
  if [ "$rc" -ne 0 ]; then
    echo "[4a] ABORT: ablation sweep failed (rc=$rc)"; exit "$rc"
  fi
  echo "[4a] $(date -u +%H:%M:%S) sweep done"
} > "$LOG" 2>&1 || exit $?

# commit OUTSIDE the redirected block so the committed log is complete and
# git failures are visible (round-3 ADVICE on round3e_chain.sh)
git add -A artifacts/ablations checkpoints/r4_simple_a16 "$LOG"
git commit -m "Round-4 ablation sweep on the longdress-scale composite crop" \
  || echo "[4a] commit failed or nothing to commit" >> "$LOG"
