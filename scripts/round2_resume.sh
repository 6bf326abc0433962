#!/usr/bin/env bash
# Unattended round-2 resume chain (after the VM restart killed the first
# night run): finish the 4-point release ladder, then produce every
# artifact the round needs — release R-D sweep with rho search, BD-rate
# report vs the octree anchor, the ablation suite, and the bench JSON —
# serialized on the single TPU chip.
#
# Idempotent-ish: training rungs resume from their latest checkpoint and
# are wall-clock-bounded, so re-running after a crash continues where it
# left off.
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/round2_resume.log
mkdir -p artifacts

common="--data 'data/corpus/*.npz' --mode hyper --batch_size 32 \
  --dtype bfloat16 --save_every 1000 --cube_size 64 --lr_schedule cosine"

run() { # alpha iters lr warmstart seconds
  local alpha=$1 iters=$2 lr=$3 init=$4 secs=$5
  echo "[resume] $(date -u +%H:%M:%S) alpha=$alpha for ${secs}s"
  eval timeout "$secs" python -m pcgcv1_tpu.cli train $common \
    --alpha "$alpha" --beta 3 --num_iteration "$iters" --lr "$lr" \
    --ckpt_dir "checkpoints/r2_a${alpha}b3" \
    ${init:+--init_ckpt_dir "$init" --reset_optimizer 1} || true
}

{
  # wait for any in-flight training process (pid file written by the
  # launcher) before touching the chip
  if [ -f /tmp/ladder.pid ]; then
    echo "[resume] $(date -u +%H:%M:%S) waiting on pid $(cat /tmp/ladder.pid)"
    while kill -0 "$(cat /tmp/ladder.pid)" 2>/dev/null; do sleep 60; done
  fi

  # finish the ladder: a0.75 ran first (launcher); complete the cosine
  # schedules of the other three rungs (resume from latest ckpt)
  run 0.75  6000 4e-5 checkpoints/r2_a2b3  7200   # no-op if already done
  run 16   19000 1e-4 ""                   9600
  run 6     8000 4e-5 ""                   5400
  run 2     8000 4e-5 ""                   5400

  echo "[resume] $(date -u +%H:%M:%S) ladder done; release eval"
  bash scripts/eval_release.sh
  echo "[resume] $(date -u +%H:%M:%S) eval done; report"
  python -m pcgcv1_tpu.cli report --eval_dir artifacts/rd_release \
    --inputs_dir artifacts --res 1024
  echo "[resume] $(date -u +%H:%M:%S) report done; ablations"
  bash scripts/round2_ablate.sh 1500
  echo "[resume] $(date -u +%H:%M:%S) ablations done; bench"
  python bench.py > artifacts/BENCH_night.json
  cat artifacts/BENCH_night.json
  echo "[resume] $(date -u +%H:%M:%S) all done"
} >> "$LOG" 2>&1
