#!/usr/bin/env bash
# Post-chain on-chip A/B: mask-wire transport and VRN kernel variants.
# Run when the TPU is free; each leg is one bench.py invocation with the
# release checkpoint (results land in artifacts/ab/*.json, stderr logs
# kept alongside for the sub-timings).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts/ab

leg() { # name env...
  local name=$1; shift
  echo "[ab] $name: $*"
  env "$@" timeout 1800 python bench.py \
    > "artifacts/ab/${name}.json" 2> "artifacts/ab/${name}.log" || true
  tail -1 "artifacts/ab/${name}.json" 2>/dev/null || echo "(failed)"
}

leg packed   PCGC_BENCH_MASKWIRE=packed PCGC_BENCH_DECONV=xla
leg rans     PCGC_BENCH_MASKWIRE=rans   PCGC_BENCH_DECONV=xla
leg pallas   PCGC_BENCH_MASKWIRE=packed PCGC_BENCH_VRN=pallas PCGC_BENCH_DECONV=xla
leg poly     PCGC_BENCH_MASKWIRE=packed PCGC_BENCH_DECONV=poly
leg best     PCGC_BENCH_MASKWIRE=rans   PCGC_BENCH_VRN=pallas PCGC_BENCH_DECONV=xla
echo "[ab] done"
