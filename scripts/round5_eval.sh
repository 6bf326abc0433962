#!/usr/bin/env bash
# Round-5 release R-D sweep + BD report over FOUR vox10 sequences:
#
#   composite_vox10   held-out mesh-sampled composite (headline)
#   scan_vox10        NEW scan-realistic content (datagen.apply_scan_noise:
#                     depth noise + coverage gaps + holes) — the content
#                     class where the trisoup anchor comparison is
#                     meaningful (round-4 VERDICT item 4)
#   revolution_vox10  held-out surface of revolution
#   synth_vox10       procedural sheet (domain-shifted stress)
#
# All four clouds now ship TRUE surface normals (scripts/round5_clouds.py)
# so D2 is scored against ground truth on both the codec and the anchors
# (round-4 VERDICT item 3), and rho_d1/rho_d2 are re-searched per rate
# point because every ladder rung was topped up this round.
#
# Usage: bash scripts/round5_eval.sh [deadline-epoch]
# rc contract: real exit statuses, abort on failure.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 14400 ))}
LOG=artifacts/round5_eval.log
CHAIN_RC=0

regen_inis() {
python - <<'PY'
import configparser, os
from pcgcv1_tpu.ablation import variant_config

if os.path.exists("artifacts/r5_ladder.txt"):
    # scripts/round5_select.py's held-out checkpoint selection
    ladder = [l.strip() for l in open("artifacts/r5_ladder.txt")
              if l.strip()]
else:
    ladder = ["checkpoints/r2_a0.75b3", "checkpoints/r2_a2b3",
              "checkpoints/r2_a6b3", "checkpoints/r2_a16b3"]
cks = [d for d in ladder if os.path.isdir(d)
       and any(x.startswith("ckpt") for x in os.listdir(d))]

LOWRATE = "checkpoints/r5_a0.75b3_lowrate"

def regen(path, seed_from=None):
    """Rebuild the ladder INI. Cached rho winners are kept for
    unchanged (scale, ckpt_dir) sections — they seed the downscale
    rungs, which the sweep does NOT re-search (see
    --search_rho_min_scale); scale-1 rungs get re-searched anyway.

    Downscale sections (scale < 1) point at the LOWRATE snapshot
    (round-4 step 8500): the round-5 selected step 13000 wins at scale
    1 (+1.1 dB at equal rate) but regresses hard on downscaled content
    (composite R1 y stream 0.209 vs 0.130 bpp — the cosine restart
    traded off-distribution robustness for in-distribution quality), so
    each operating regime gets the checkpoint that wins there."""
    old = configparser.ConfigParser()
    if os.path.exists(path):
        old.read(path)
    elif seed_from and os.path.exists(seed_from):
        old.read(seed_from)   # new sequence: seed from composite's
    variant_config(path, cks, extra_scales=(0.375, 0.5, 0.625))
    new = configparser.ConfigParser()
    new.read(path)
    kept = 0
    for sec in new.sections():
        if float(new[sec].get("scale", "1.0")) < 1.0 \
                and os.path.isdir(LOWRATE):
            new[sec]["ckpt_dir"] = LOWRATE
        if (old.has_section(sec)
                and old[sec].get("scale") == new[sec].get("scale")):
            for k in ("rho_d1", "rho_d2"):
                if old[sec].get(k):
                    new[sec][k] = old[sec][k]
                    kept += 1
    with open(path, "w") as f:
        new.write(f)
    print(f"{path}: {len(new.sections())} rate points, {kept} rho "
          "values carried")

regen("artifacts/rd_release_composite.ini")
regen("artifacts/rd_release_scan.ini",
      seed_from="artifacts/rd_release_composite.ini")
regen("artifacts/rd_release_revolution.ini")
regen("artifacts/rd_release.ini")
PY
}

run_eval() { # input ini [search-min-scale]
  local input=$1 ini=$2 minscale=${3:-1.0} name rc
  name=$(basename "$input" .ply)
  if [ ! -f "$input" ]; then
    echo "[5e] $name: input missing, skipped"; return 0
  fi
  local left=$((DEADLINE - $(date +%s)))
  if [ "$left" -lt 300 ]; then
    echo "[5e] $name: skipped (${left}s left)"; return 0
  fi
  echo "[5e] $(date -u +%H:%M:%S) sweep $name (${left}s budget)"
  python -m pcgcv1_tpu.cli eval \
    --input "$input" --cfgdir "$ini" --rootdir artifacts/rd_release \
    --res 1024 --mode hyper --chunk 96 --dtype bfloat16 \
    --search_rho --search_rho_min_scale "$minscale" \
    --deadline "$((DEADLINE - 60))"
  rc=$?
  echo "[5e] $name eval rc=$rc"
  if [ "$rc" -ne 0 ]; then CHAIN_RC=1; fi
  return "$rc"
}

{
  echo "[5e] $(date -u +%H:%M:%S) round-5 eval chain start"
  regen_inis || { echo "[5e] INI regen FAILED rc=$?"; exit 1; }
  # composite reuses THIS round's fresh scale-1 rho winners (searched in
  # the first, device-coder pass — rho is a top-k property, independent
  # of the entropy coder); synth reuses its carried round-4 winners
  run_eval artifacts/composite_vox10.ply artifacts/rd_release_composite.ini 9
  run_eval artifacts/scan_vox10.ply artifacts/rd_release_scan.ini
  run_eval artifacts/revolution_vox10.ply artifacts/rd_release_revolution.ini
  run_eval artifacts/synth_vox10.ply artifacts/rd_release.ini 9
  echo "[5e] $(date -u +%H:%M:%S) BD report (octree + gpcc octree/trisoup)"
  python -m pcgcv1_tpu.cli report \
    --eval_dir artifacts/rd_release --inputs_dir artifacts --res 1024
  rc=$?
  echo "[5e] report rc=$rc"
  if [ "$rc" -ne 0 ]; then CHAIN_RC=1; fi
  echo "[5e] $(date -u +%H:%M:%S) chain done rc=$CHAIN_RC"
} >> "$LOG" 2>&1
exit "$CHAIN_RC"
