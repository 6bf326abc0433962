#!/usr/bin/env bash
# Round-3 pipeline watcher: when the running training chain (round3b)
# exits, run — in order — the deconv A/B bench, the ladder-extension
# chain (round3c), the release R-D sweep, the ablation sweep, the vox12
# multi-scale eval, and a final bench. Every stage is deadline-gated and
# logged; the watcher survives this session dying.
#
# Usage: bash scripts/round3_watch.sh <chain-pid> <deadline-epoch>
set -u
cd "$(dirname "$0")/.."
CHAIN_PID=${1:?chain pid}
DEADLINE=${2:?deadline epoch}
LOG=artifacts/round3_watch.log

have_time() { [ $((DEADLINE - $(date +%s))) -gt "$1" ]; }

stage() { # name est-seconds timeout-seconds cmd...
  local name=$1 est=$2 to=$3
  shift 3
  if ! have_time "$est"; then
    echo "[watch] $(date -u +%H:%M:%S) SKIP $name (deadline)"
    return 0
  fi
  echo "[watch] $(date -u +%H:%M:%S) START $name"
  timeout "$to" "$@" || echo "[watch] $name rc=$? (timeout or error)"
  echo "[watch] $(date -u +%H:%M:%S) END $name"
}

{
  echo "[watch] $(date -u +%H:%M:%S) waiting on chain pid $CHAIN_PID"
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
  echo "[watch] $(date -u +%H:%M:%S) chain done"

  # paired deconv A/B inside one bench process (xla warm passes, then the
  # poly probe); keep the evidence in artifacts/ab/
  mkdir -p artifacts/ab
  stage deconv_ab 600 1800 bash -c \
    'python bench.py > artifacts/ab/deconv_probe.json 2> artifacts/ab/deconv_probe.log'

  stage round3c 1200 9000 bash scripts/round3c_chain.sh "$DEADLINE"

  stage release_sweep 1800 10800 env SKIP_STE_FT=1 bash scripts/eval_release.sh
  stage ablate 1500 9000 bash scripts/round3_ablate.sh --search_rho
  stage vox12 1200 7200 bash scripts/eval_vox12.sh

  stage report 300 1800 python -m pcgcv1_tpu.cli report \
    --eval_dir artifacts/rd_release --inputs_dir artifacts --res 1024

  stage final_bench 300 1800 bash -c \
    'python bench.py > artifacts/BENCH_round3.json 2> artifacts/BENCH_round3.log'

  echo "[watch] $(date -u +%H:%M:%S) all stages done"
} >> "$LOG" 2>&1
