#!/bin/bash
# Sample the forked bench/profile JVM's driver-side threads with jstack.
# Usage: sample_driver.sh <main-class-substring> <n-samples> <interval-s> <outfile>
# Finds the newest JVM whose command line matches the substring and dumps
# stacks repeatedly; aggregate with scripts/agg_stacks.py.
set -u
PAT="$1"; N="${2:-30}"; IV="${3:-0.3}"; OUT="${4:-/tmp/driver_stacks.txt}"
: > "$OUT"
for i in $(seq 1 "$N"); do
  PID=$(jps -l 2>/dev/null | grep -F "$PAT" | awk '{print $1}' | head -1)
  if [ -n "${PID:-}" ]; then
    echo "=== SAMPLE $i pid=$PID $(date +%s.%N) ===" >> "$OUT"
    jstack "$PID" >> "$OUT" 2>/dev/null
  fi
  sleep "$IV"
done
echo "wrote $OUT ($(grep -c '=== SAMPLE' "$OUT") samples)"
