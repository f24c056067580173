#!/bin/bash
# One interleaved 4<->1-core scaling pair at 4M pages (fixture reused).
#
# Round-3 hardening (VERDICT.md round-2 post-mortem):
#  - idle-box pre-flight: a timed leg REFUSES to start while any other
#    JVM holds >1 GB RSS (a co-running JVM depressed round-2's 1-core leg
#    ~11% and invalidated an otherwise-clean 0.83 pair);
#  - NELSPARK_BENCH_JVM=1 opts the forked JVM into the eager
#    -Xms/+AlwaysPreTouch heap (build.sbt) — timed legs only; driver-run
#    Verify/Bench now default to a lazy heap so they survive a busy box;
#  - NEVER leave this running near a round boundary: the leftover 1-core
#    leg (16 GB JVM + 33 GB tmpfs) OOM-killed the round-2 driver contract.
set -e
cd /root/repo
OUT="${1:-BENCH_scaling.json}"
export SPARK_DRIVER_MEM=16g
export NELSPARK_BENCH_JVM=1

# Pre-flight: wait (up to 10 min) for the box to be idle — no foreign JVM
# above 1 GB RSS. $$ children (the sbt we are about to launch) don't exist
# yet, so any hit is a genuine co-tenant.
idle_wait() {
  for _ in $(seq 1 60); do
    busy=$(ps -eo rss,comm | awk '$2 ~ /java/ && $1 > 1048576 {n++} END {print n+0}')
    if [ "$busy" -eq 0 ]; then return 0; fi
    echo "[scaling-pair] $busy JVM(s) >1GB RSS still running; waiting 10s..."
    sleep 10
  done
  echo "[scaling-pair] box never went idle — refusing to time a leg" >&2
  return 1
}

for lvl in 4 1; do
  idle_wait
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
