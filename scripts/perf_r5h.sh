#!/bin/bash
# Round-5h: final honest st2d at fully-warm HEAD (stable aot keys + memo),
# sharing the pipeline-populated blobs.
set -u
cd /root/repo
LOG=/tmp/perf_r5h.log
echo "=== perf_r5h start $(date) ===" >> "$LOG"
if [ -f /tmp/perf_r5g.pid ]; then
  while kill -0 "$(cat /tmp/perf_r5g.pid)" 2>/dev/null; do sleep 20; done
fi
run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}
run st2d_final 4000 python scripts/bench_st2d.py
run st2d_warm 4000 python scripts/bench_st2d.py
echo "=== perf_r5h done $(date) ===" >> "$LOG"
