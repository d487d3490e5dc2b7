#!/bin/bash
# Uncontended measurement block (run ONLY with an idle chip): regenerates
# every judged perf/numerics artifact at HEAD (VERDICT r4 #1/#3/#4/#8).
# Usage: bash scripts/timing_block.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/timing_r5}
mkdir -p "$OUT"
export WALDO_CHIP_SHARED="exclusive (timing block, no concurrent jobs)"
export JAX_COMPILATION_CACHE_DIR=~/.cache/waldo_jax

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ==="
  "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "rc=$? ($name)"
  tail -c 400 "$OUT/$name.json"; echo
}

run bench_flagship env WALDO_BENCH_LOAD_DIM=256 python bench.py
run bench_hd       env WALDO_BENCH_LOAD_DIM=512 python bench.py
run bench_kitti    env WALDO_BENCH_DATASET=kitti WALDO_BENCH_LOAD_DIM=256 python bench.py

echo "=== stage traces ==="
python scripts/stage_trace.py --load_dim 256 --out "$OUT/stage_trace_256.json" \
  > "$OUT/trace256.log" 2>&1; echo "rc=$? (trace256)"
python scripts/stage_trace.py --load_dim 512 --out "$OUT/stage_trace_512.json" \
  > "$OUT/trace512.log" 2>&1; echo "rc=$? (trace512)"

echo "=== precision audit ==="
python scripts/precision_audit.py --out "$OUT/precision_audit.json" \
  > "$OUT/audit.log" 2>&1; echo "rc=$? (audit)"

echo "=== tp_sz sampler audit ==="
python scripts/tpsz_audit.py --out "$OUT/tpsz_sampler.json" \
  > "$OUT/tpsz.log" 2>&1; echo "rc=$? (tpsz)"

echo "timing block complete: $OUT"
