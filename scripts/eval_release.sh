#!/usr/bin/env bash
# End-of-round R-D artifact: sweep the release checkpoints over the
# bench-scale synthetic vox10 cloud and store CSV + plot in artifacts/.
# (No test corpus ships with either repo; the synthetic surface cloud is
# the reproducible stand-in — the harness itself is the reference's
# eval.py equivalent and runs unchanged on real 8iVFB files.)
set -eu
cd "$(dirname "$0")/.."

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
from pcgcv1_tpu.evalharness import default_config
import configparser, glob, os
cks = [d for d in ("checkpoints/hyper_a12b3", "checkpoints/hyper_a6b3",
                   "checkpoints/hyper_a2b3") if os.path.isdir(d)]
default_config("artifacts/rd_release.ini", cks)
print("rate points:", cks)
PY

python -m pcgcv1_tpu.cli eval \
  --input artifacts/synth_vox10.ply \
  --cfgdir artifacts/rd_release.ini \
  --rootdir artifacts/rd_release \
  --res 1024 --mode hyper --chunk 64 --dtype bfloat16
echo "[eval done]"
ls -la artifacts/rd_release/
