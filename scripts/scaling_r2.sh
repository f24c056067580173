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
  # capture the level's output; a crashed level must ABORT the protocol
  # (a silently skipped level breaks the interleaved pairing), so check
  # sbt's exit status before grepping the JSON line out
  log="$(mktemp)"
  if ! sbt -batch "runMain nelspark.Main bench 4000000 $lvl $OUT" >"$log" 2>&1; then
    echo "[scaling] LEVEL $lvl FAILED — aborting protocol" >&2
    tail -30 "$log" >&2
    exit 1
  fi
  grep -E '^\{' "$log" || true
  rm -f "$log"
done
echo "[scaling] done $(date -u +%H:%M:%S)"
