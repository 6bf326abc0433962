#!/usr/bin/env bash
# Round-5 focused cube-size experiment (round-4 VERDICT item 5).
#
# Round-4's cube128_vs_cube64 row showed +17.4% D1 where the reference
# finds ~parity (results.ipynb cells 68-69). The round-4 CSV breakdown
# already isolates the cause: hyper128's y bpp is LOWER than hyper64's
# at every rung (consistent with the reference's parity) — the entire
# loss is the z stream (e.g. R6: 0.252 vs 0.190 bpp), because 128^3
# partitions cover ~2-3x more empty volume and the FACTORIZED z prior
# pays per element over it, amplified by the round-4 z entropy bloat
# (z/y ~0.95 in training). This sweep re-runs the cube-size variants on
# the round-5 ladder (whose z entropy is substantially lower after the
# cosine-restart training) into a SEPARATE directory so every row in it
# is checkpoint-coherent; artifacts/ablations/ remains the round-4
# evidence for the model-family rows.
#
# Usage: bash scripts/round5_cube.sh [deadline-epoch]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 7200 ))}
LOG=artifacts/round5_cube.log

{
  echo "[5c] $(date -u +%H:%M:%S) cube-size sweep (deadline $DEADLINE)"
  python -m pcgcv1_tpu.cli ablate \
    --input artifacts/composite_crop_vox10.ply \
    --out artifacts/ablations_r5 \
    --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
    --res 1024 --chunk 96 --dtype bfloat16 --extra_scales 0.5,0.625 \
    --reuse --deadline "$((DEADLINE - 60))"
  rc=$?
  echo "[5c] ablate rc=$rc"
  [ "$rc" -ne 0 ] && { echo "[5c] ABORT (rc=$rc)"; exit "$rc"; }
  echo "[5c] $(date -u +%H:%M:%S) done"
} >> "$LOG" 2>&1
