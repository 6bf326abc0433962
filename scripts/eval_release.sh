#!/usr/bin/env bash
# End-of-round R-D artifact: sweep the release (round-2 ladder) checkpoints
# over the bench-scale synthetic vox10 cloud; store CSV + plot in artifacts/.
# (No test corpus ships with either repo; the synthetic surface cloud is
# the reproducible stand-in — the harness itself is the reference's
# eval.py equivalent and runs unchanged on real 8iVFB files.)
#
# With --search_rho the harness sweeps rho per rate point and caches the
# winners into the INI in place (reference eval_ablation_studies.py:152-205),
# then evaluates at rho_d1/rho_d2 — the release CSV shows rho!=1 rows.
set -eu
cd "$(dirname "$0")/.."

# Rounding-aware (STE) fine-tune of the lowest-rate rung before the sweep:
# at alpha=0.75 the noise relaxation collapses under real rounding
# (eval IoU 0.27 vs train 0.55 in its train_log); a short --quant ste
# pass matches train-time to decode-time. Skipped once done (step file).
if [ "${SKIP_STE_FT:-0}" != "1" ]; then
  echo "[eval_release] STE fine-tune of r2_a0.75b3"
  timeout 4500 python -m pcgcv1_tpu.cli train \
    --data 'data/corpus/*.npz' --mode hyper --batch_size 32 \
    --dtype bfloat16 --save_every 1000 --cube_size 64 \
    --lr_schedule cosine --quant ste \
    --alpha 0.75 --beta 3 --num_iteration 8500 --lr 2e-5 \
    --ckpt_dir checkpoints/r2_a0.75b3 || true
fi

python - <<'PY'
from bench import _workload
from pcgcv1_tpu.ops import write_ply
import os
os.makedirs("artifacts", exist_ok=True)
pts = _workload()
write_ply("artifacts/synth_vox10.ply", pts)
print("cloud:", len(pts), "points")
PY

python - <<'PY'
from pcgcv1_tpu.ablation import variant_config
import os
# rate ladder low->high bpp: alpha 0.75, 2, 6, 16 (reference alphas,
# eval_ablation_studies.py:71-77) plus the reference's extra low-rate
# point (lowest-rate checkpoint at scale 5/8); fall back to round-1
# ckpts if a rung hasn't finished training
ladder = ["checkpoints/r2_a0.75b3", "checkpoints/r2_a2b3",
          "checkpoints/r2_a6b3", "checkpoints/r2_a16b3"]
cks = [d for d in ladder if os.path.isdir(d)
       and any(x.startswith("ckpt") for x in os.listdir(d))]
if not cks:
    cks = [d for d in ("checkpoints/hyper_a2b3", "checkpoints/hyper_a6b3",
                       "checkpoints/hyper_a12b3") if os.path.isdir(d)]
variant_config("artifacts/rd_release.ini", cks, extra_scales=(0.625,))
print("rate points:", cks, "+ scale 0.625 low point")
PY

python -m pcgcv1_tpu.cli eval \
  --input artifacts/synth_vox10.ply \
  --cfgdir artifacts/rd_release.ini \
  --rootdir artifacts/rd_release \
  --res 1024 --mode hyper --chunk 64 --dtype bfloat16 \
  ${EVAL_FLAGS:---search_rho}

# Second release sequence: the held-out composite cloud from the corpus
# generator's --eval_clouds split (in-domain held-out, the role 8iVFB test
# sequences play for the reference; synth_vox10 is the domain-shifted
# stress cloud). Separate INI so per-sequence optimal-rho caching doesn't
# clobber the first sequence's winners.
if [ -f artifacts/eval/eval_composite_vox10.ply ]; then
  cp -f artifacts/eval/eval_composite_vox10.ply artifacts/composite_vox10.ply
  [ -f artifacts/rd_release_composite.ini ] || \
    cp artifacts/rd_release.ini artifacts/rd_release_composite.ini
  python -m pcgcv1_tpu.cli eval \
    --input artifacts/composite_vox10.ply \
    --cfgdir artifacts/rd_release_composite.ini \
    --rootdir artifacts/rd_release \
    --res 1024 --mode hyper --chunk 64 --dtype bfloat16 \
    ${EVAL_FLAGS_COMPOSITE-${EVAL_FLAGS:---search_rho}}
fi
echo "[eval done]"
ls -la artifacts/rd_release/
