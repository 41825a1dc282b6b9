#!/bin/bash
# Round-5f TPU batch: final honest numbers under the value-fetch timing
# discipline — st2d (regenerates BENCH_ST2D.json) and the official
# headline bench (whose windows are corroborated by the device profiler;
# the value fetch is insurance).
set -u
cd /root/repo
LOG=/tmp/perf_r5f.log
echo "=== perf_r5f start $(date) ===" >> "$LOG"

if [ -f /tmp/perf_r5e.pid ]; then
  while kill -0 "$(cat /tmp/perf_r5e.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}

run st2d_honest 4000 python scripts/bench_st2d.py
run bench_honest 10000 python bench.py

echo "=== perf_r5f done $(date) ===" >> "$LOG"
