#!/bin/bash
# Round-5c TPU batch: warm re-measures after the round-5 fixes — st2d
# with adaptive settling (windows must agree), and the bf16 first-approach
# e2e with the lag-by-one sync fix + warm persistent cache (the cold run
# was compile-dominated at 618s).
set -u
cd /root/repo
LOG=/tmp/perf_r5c.log
echo "=== perf_r5c start $(date) ===" >> "$LOG"

run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}

run st2d 4000 python scripts/bench_st2d.py

run e2e_bf16_warm 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/first_e2e_bf16_warm

echo "=== perf_r5c done $(date) ===" >> "$LOG"
