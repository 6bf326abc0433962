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
#
# Notes vs the watcher's historical `--search_rho` invocation: the rho
# search costs ~13 host-side pc_error passes per rate point on this
# 1-core host (~8 min/pt); at 26 points that cannot fit the stage window.
# Every variant is therefore scored at rho=1.0 — identical treatment on
# both sides of every BD comparison, so the deltas stay fair; the release
# sweep is where the rho-search capability is exercised. Any --search_rho
# argument passed in is deliberately ignored.
#
# The two simple-model rungs showed the same rounding-collapse signature
# the a0.75 hyper rung had in round 2 (train distortion 0.39 vs eval 3.2):
# a short STE fine-tune through real rounding is the known cure, applied
# here deadline-gated before the sweep.
set -eu
cd "$(dirname "$0")/.."

# round-3 driver deadline (epoch); override via ROUND3_DEADLINE
DEADLINE=${ROUND3_DEADLINE:-1787190145}
# leave room for the vox12 sweep (~3000s, itself deadline-bounded) +
# report (anchor cache pre-warmed, ~300s) + final bench (~400s)
ABLATE_STOP=$((DEADLINE - 3900))
have_time() { [ $(( ABLATE_STOP - $(date +%s) )) -gt "$1" ]; }

[ -f artifacts/composite_vox10.ply ] || {
  echo "missing artifacts/composite_vox10.ply (run eval_release.sh first)";
  exit 1; }

ste_common=(--data 'data/corpus/*.npz' --mode factorized --modelname simple
            --batch_size 32 --dtype bfloat16 --save_every 500
            --cube_size 64 --beta 3 --lr_schedule cosine
            --quant ste --lr 5e-5 --est_lr 5e-3)

if have_time 4700; then
  echo "[ablate] STE fine-tune r3_simple_a2 (2500 -> 5000)"
  timeout 1100 python -m pcgcv1_tpu.cli train "${ste_common[@]}" \
    --alpha 2 --num_iteration 5000 \
    --ckpt_dir checkpoints/r3_simple_a2 || true
fi
if have_time 3800; then
  echo "[ablate] STE fine-tune r3_simple_a16 (4500 -> 5500)"
  timeout 600 python -m pcgcv1_tpu.cli train "${ste_common[@]}" \
    --alpha 16 --num_iteration 5500 \
    --ckpt_dir checkpoints/r3_simple_a16 || true
fi

python -m pcgcv1_tpu.cli ablate \
  --input artifacts/composite_vox10.ply \
  --out artifacts/ablations \
  --ladder checkpoints/r2_a0.75b3,checkpoints/r2_a2b3,checkpoints/r2_a6b3,checkpoints/r2_a16b3 \
  --factorized_ladder checkpoints/r3_fact_a2,checkpoints/r3_fact_a16 \
  --simple_ladder checkpoints/r3_simple_a2,checkpoints/r3_simple_a16 \
  --res 1024 --chunk 96 --dtype bfloat16 --extra_scales 0.625 \
  --deadline "$ABLATE_STOP"

echo "[ablate done]"
cat artifacts/ablations/ablation_bd.csv
