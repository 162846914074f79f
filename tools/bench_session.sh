#!/bin/bash
# TPU bench session: run when the chip is free (no concurrent training —
# axon tunnel contention stalls both). Measures the solver-path choice
# and batch scaling, then prints a summary table.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bench_session}
mkdir -p "$OUT"

run() {
  name=$1; shift
  echo "=== $name ($*)" | tee -a "$OUT/summary.txt"
  env "$@" timeout 900 python bench.py 2>"$OUT/$name.err" | tail -1 | tee "$OUT/$name.json" | tee -a "$OUT/summary.txt"
}

run xla_4096      BENCH_ENVS=4096
run pallas_4096   BENCH_ENVS=4096  DM_TPU_PGS_PALLAS=1
run xla_8192      BENCH_ENVS=8192
run pallas_8192   BENCH_ENVS=8192  DM_TPU_PGS_PALLAS=1
run xla_16384     BENCH_ENVS=16384
run pallas_16384  BENCH_ENVS=16384 DM_TPU_PGS_PALLAS=1

echo "--- summary ---"
cat "$OUT/summary.txt"
