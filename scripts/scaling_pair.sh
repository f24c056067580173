#!/bin/bash
# One additional interleaved 4<->1-core pair at 4M pages (fixture reused),
# with the listener-bus drain fix in the metrics path.
set -e
cd /root/repo
OUT="${1:-BENCH_scaling.json}"
export SPARK_DRIVER_MEM=16g
for lvl in 4 1; do
  echo "[scaling-pair] level=$lvl $(date -u +%H:%M:%S)"
  log="$(mktemp)"
  if ! sbt -batch "runMain nelspark.Main bench 4000000 $lvl $OUT" >"$log" 2>&1; then
    echo "[scaling-pair] LEVEL $lvl FAILED" >&2
    tail -30 "$log" >&2
    exit 1
  fi
  grep -E '^\{' "$log" || true
  rm -f "$log"
done
echo "[scaling-pair] done $(date -u +%H:%M:%S)"
