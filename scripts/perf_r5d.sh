#!/bin/bash
# Round-5d TPU batch: chained-window st2d (the un-chained windows were
# dedupe-inflated), then the bf16 first-approach e2e twice — the first
# run populates the new AOT executable blobs (2D-ST create + scan chunk,
# MSE scan), the second measures the true warm start.
set -u
cd /root/repo
LOG=/tmp/perf_r5d.log
echo "=== perf_r5d start $(date) ===" >> "$LOG"

run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}

run st2d_chained 4000 python scripts/bench_st2d.py

run e2e_bf16_populate 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/first_e2e_bf16_p

run e2e_bf16_warm2 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/first_e2e_bf16_w2

echo "=== perf_r5d done $(date) ===" >> "$LOG"
