#!/bin/bash
# Round-2 scaling protocol (BASELINE.md): 4M pages, fresh JVM per level,
# interleaved 4<->1-core pairs after a fixture-generating 32-core run.
# Usage: scripts/scaling_r2.sh [outJson]
set -e
cd /root/repo
OUT="${1:-BENCH_scaling.json}"
export SPARK_DRIVER_MEM=16g
for lvl in 32 4 1 4; do
  echo "[scaling] level=$lvl $(date -u +%H:%M:%S)"
  sbt -batch "runMain nelspark.Main bench 4000000 $lvl $OUT" 2>&1 \
    | grep -E '^\{' || true
done
echo "[scaling] done $(date -u +%H:%M:%S)"
