#!/usr/bin/env bash
# vox12 sparse high-res multi-scale release artifact (BASELINE config #4:
# House_without_roof res 4096, multi-scale coding; reference results.ipynb
# cells 84-91 sweep scale 0.125..1 with vox10-trained checkpoints).
#
# Generates a held-out mesh-sampled vox12 cloud (res 4095, ~8M sampled
# points -> sparse surface occupancy), writes a multi-scale INI where the
# rate axis is the *positional scale* (one trained rung per scale band,
# the reference's recipe), and runs the full round trip in both modes:
#   hyper, device coder        -> artifacts/rd_release/house_vox12.csv
#   factorized (two-pass enc)  -> artifacts/rd_release/house_vox12_f.csv
set -eu
cd "$(dirname "$0")/.."

python - <<'PY'
import numpy as np, os, sys
sys.path.insert(0, "scripts")
from make_corpus import mesh_composite, sample_mesh_points
from pcgcv1_tpu.training.datagen import random_rotation
from pcgcv1_tpu.ops import write_ply

path = "artifacts/house_vox12.ply"
if not os.path.exists(path):
    rng = np.random.default_rng(4096)
    verts, faces = mesh_composite(rng)
    pts, nrm = sample_mesh_points(verts, faces, 8_000_000, rng,
                                  return_normals=True)
    rot = random_rotation(rng)
    pts = pts @ rot.T
    nrm = nrm @ rot.T
    pts = pts - pts.min(axis=0)
    pts = pts * (4095.0 / pts.max())
    qpts, idx = np.unique(np.round(pts), axis=0, return_index=True)
    # true mesh normals per surviving voxel: the report's D2 anchor and
    # metrics then skip the k-NN normal estimation over millions of points
    write_ply(path, qpts.astype(np.int32), normals=nrm[idx])
    print(f"{path}: {len(qpts)} points @ res 4095", flush=True)
PY

python - <<'PY'
import configparser, os

# multi-scale ladder: low scales pair with the high-rate rung (the
# downscaled cloud is dense -> spend bits), reference pairing logic
hyper_sections = [
    ("R1", "0.125", "checkpoints/r2_a16b3"),
    ("R2", "0.25",  "checkpoints/r2_a16b3"),
    ("R3", "0.375", "checkpoints/r2_a16b3"),
    ("R4", "0.5",   "checkpoints/r2_a6b3"),
    ("R5", "0.625", "checkpoints/r2_a2b3"),
    ("R6", "0.75",  "checkpoints/r2_a2b3"),
]
fact_sections = [
    ("R1", "0.125", "checkpoints/r3_fact_a16"),
    ("R2", "0.25",  "checkpoints/r3_fact_a16"),
    ("R3", "0.375", "checkpoints/r3_fact_a16"),
    ("R4", "0.5",   "checkpoints/r3_fact_a16"),
    ("R5", "0.625", "checkpoints/r3_fact_a2"),
    ("R6", "0.75",  "checkpoints/r3_fact_a2"),
]
for path, sections in (("artifacts/rd_vox12.ini", hyper_sections),
                       ("artifacts/rd_vox12_f.ini", fact_sections)):
    old = configparser.ConfigParser()
    if os.path.exists(path):
        old.read(path)
    cfg = configparser.ConfigParser()
    cfg["DEFAULT"] = {"cube_size": "64", "min_num": "64"}
    for name, scale, ck in sections:
        cfg[name] = {"scale": scale, "ckpt_dir": ck,
                     "rho_d1": "1.0", "rho_d2": "1.0"}
        if (old.has_section(name) and old[name].get("scale") == scale
                and old[name].get("ckpt_dir") == ck):
            for k in ("rho_d1", "rho_d2"):
                if old[name].get(k):
                    cfg[name][k] = old[name][k]
    with open(path, "w") as f:
        cfg.write(f)
    print(f"{path}: {len(cfg.sections())} rate points")
PY

# Deadline-bounded sweeps: the harness flushes its CSV after every rate
# point, so a timeout keeps the completed rows. The hyper sweep gets half
# the remaining window (floor 10 min), factorized the rest minus a
# report/bench reserve.
DEADLINE=${ROUND3_DEADLINE:-1787190145}
left=$(( DEADLINE - $(date +%s) - 900 ))
[ "$left" -gt 600 ] || left=600
t_hyper=$(( left / 2 )); [ "$t_hyper" -gt 600 ] || t_hyper=600

timeout "$t_hyper" python -m pcgcv1_tpu.cli eval \
  --input artifacts/house_vox12.ply --cfgdir artifacts/rd_vox12.ini \
  --rootdir artifacts/rd_release --res 4096 --mode hyper \
  --chunk 96 --dtype bfloat16 ${EVAL_FLAGS:-} \
  || echo "[vox12] hyper sweep cut at ${t_hyper}s (partial CSV kept)"

t_fact=$(( DEADLINE - $(date +%s) - 900 ))
[ "$t_fact" -gt 600 ] || t_fact=600
timeout "$t_fact" python -m pcgcv1_tpu.cli eval \
  --input artifacts/house_vox12.ply --cfgdir artifacts/rd_vox12_f.ini \
  --rootdir artifacts/rd_release --res 4096 --mode factorized \
  --chunk 96 --dtype bfloat16 --tag f ${EVAL_FLAGS_F:-} \
  || echo "[vox12] factorized sweep cut at ${t_fact}s (partial CSV kept)"

echo "[vox12 eval done]"
