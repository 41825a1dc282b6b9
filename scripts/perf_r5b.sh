#!/bin/bash
# Round-5b TPU batch: bench_st2d with the settle-pass fix (windows must
# agree), then the fused-background A/B (ST3D_FUSED_BG) at 512^2 and at
# 768^2 — the rung where frame-assembly formatting dominates (VERDICT r4
# item 1b). Serial; waits for perf_r5.sh to finish.
set -u
cd /root/repo
LOG=/tmp/perf_r5b.log
echo "=== perf_r5b start $(date) ===" >> "$LOG"

if [ -f /tmp/perf_r5.pid ]; then
  while kill -0 "$(cat /tmp/perf_r5.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}

run st2d 4000 python scripts/bench_st2d.py

ST3D_AB_VARIANTS="default=,fused_bg=ST3D_FUSED_BG:1" \
  run ab_fused_512 8000 python scripts/ab_bench.py 7

ST3D_AB_VARIANTS="default=,fused_bg=ST3D_FUSED_BG:1" ST3D_AB_SIZE=768 \
  run ab_fused_768 8000 python scripts/ab_bench.py 7

echo "=== perf_r5b done $(date) ===" >> "$LOG"
