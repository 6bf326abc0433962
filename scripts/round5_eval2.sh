#!/usr/bin/env bash
# Round-5 eval phase 2: finish whatever round5_eval.sh's deadline cut.
#
# Re-sweeps ONLY the sequences named in $SEQS (default: the ones the
# phase-1 chain is most likely to have truncated — scan, then the two
# sequences whose D2 rescoring against true/analytic normals is the
# round-5 evidence: synth, revolution), then regenerates the BD table.
# No rho re-search (min_scale 9): every section carries a cached winner
# — phase 1's fresh scale-1 searches (scan R4: 1.4/1.4) or the stable
# round-4 winners; a search costs ~20 min/rung on this 1-core host.
#
# Usage: bash scripts/round5_eval2.sh [deadline-epoch] [seqs...]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:-$(( $(date +%s) + 5400 ))}
shift || true
SEQS=${*:-"scan synth revolution"}
LOG=artifacts/round5_eval.log
CHAIN_RC=0

ini_for() {
  case "$1" in
    composite)  echo artifacts/rd_release_composite.ini ;;
    scan)       echo artifacts/rd_release_scan.ini ;;
    revolution) echo artifacts/rd_release_revolution.ini ;;
    synth)      echo artifacts/rd_release.ini ;;
  esac
}

{
  echo "[5e2] $(date -u +%H:%M:%S) phase-2 start (seqs: $SEQS)"
  for seq in $SEQS; do
    input=artifacts/${seq}_vox10.ply
    ini=$(ini_for "$seq")
    left=$((DEADLINE - $(date +%s)))
    if [ ! -f "$input" ] || [ -z "$ini" ]; then
      echo "[5e2] $seq: missing input/ini, skipped"; continue
    fi
    if [ "$left" -lt 300 ]; then
      echo "[5e2] $seq: skipped (${left}s left)"; continue
    fi
    echo "[5e2] $(date -u +%H:%M:%S) sweep $seq (${left}s budget)"
    python -m pcgcv1_tpu.cli eval \
      --input "$input" --cfgdir "$ini" --rootdir artifacts/rd_release \
      --res 1024 --mode hyper --chunk 96 --dtype bfloat16 \
      --search_rho --search_rho_min_scale 9 \
      --deadline "$((DEADLINE - 60))"
    rc=$?
    echo "[5e2] $seq eval rc=$rc"
    [ "$rc" -ne 0 ] && CHAIN_RC=1
  done
  echo "[5e2] $(date -u +%H:%M:%S) BD report"
  python -m pcgcv1_tpu.cli report \
    --eval_dir artifacts/rd_release --inputs_dir artifacts --res 1024
  rc=$?
  echo "[5e2] report rc=$rc"
  [ "$rc" -ne 0 ] && CHAIN_RC=1
  echo "[5e2] $(date -u +%H:%M:%S) phase-2 done rc=$CHAIN_RC"
} >> "$LOG" 2>&1
exit "$CHAIN_RC"
