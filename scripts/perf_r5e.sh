#!/bin/bash
# Round-5e TPU batch: second-approach warm-start proof — run a short
# 512^2 texture-only optimization twice; the first populates the epoch
# scan's AOT blob, the second must start its epochs within seconds.
set -u
cd /root/repo
LOG=/tmp/perf_r5e.log
echo "=== perf_r5e start $(date) ===" >> "$LOG"

if [ -f /tmp/perf_r5d.pid ]; then
  while kill -0 "$(cat /tmp/perf_r5d.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}

run sa_populate 3000 python second_approach.py --size 512 --n_views 4 \
  --batch_size 4 --epochs 200 --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/sa_warm_p

run sa_warm 3000 python second_approach.py --size 512 --n_views 4 \
  --batch_size 4 --epochs 200 --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/sa_warm_w

echo "=== perf_r5e done $(date) ===" >> "$LOG"
