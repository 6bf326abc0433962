#!/usr/bin/env bash
# Round-3 ablation sweep (VERDICT r2, Missing #1): all five reference
# comparisons with trained, rate-overlapping ladders.
#
#   hyper ladder       r2_a0.75b3 r2_a2b3 r2_a6b3 r2_a16b3  (4 rungs + 5/8)
#   factorized ladder  r3_fact_a2 r3_fact_a16               (2 rungs + 5/8)
#   simple ladder      r3_simple_a2 r3_simple_a16           (2 rungs + 5/8)
#
# Input: the held-out mesh-sampled composite cloud (in-domain analogue of
# the reference's 8iVFB ablation sequence, results.ipynb cells 68-110).
set -eu
cd "$(dirname "$0")/.."

[ -f artifacts/composite_vox10.ply ] || {
  echo "missing artifacts/composite_vox10.ply (run eval_release.sh first)";
  exit 1; }

python -m pcgcv1_tpu.cli ablate \
  --input artifacts/composite_vox10.ply \
  --out artifacts/ablations \
  --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
  --factorized_ladder checkpoints/r3_fact_a2,checkpoints/r3_fact_a16 \
  --simple_ladder checkpoints/r3_simple_a2,checkpoints/r3_simple_a16 \
  --res 1024 --chunk 96 --dtype bfloat16 --extra_scales 0.625 \
  "$@"

echo "[ablate done]"
cat artifacts/ablations/ablation_bd.csv
