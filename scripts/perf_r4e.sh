#!/bin/bash
# Round-4e TPU batch: redesigned tree (static corner weights + windowed
# landing) + f32 conv1_2-bwd band fix. Serial, one TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/perf_r4e.log
echo "=== perf_r4e start $(date) ===" >> "$LOG"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? ($(date)) ---" >> "$LOG"
}

run ladder_check 3000 python scripts/stage1_ladder_check.py

# f32 CLI e2e retry (the r4d failure this batch's band fix addresses) —
# short run first to fail fast, then the full wall-clock measurement.
run verify_cli_f32 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 20 --n_mse_steps 10 \
  --save_intermediate False --output_path /tmp/verify_e2e_short

# Tree redesign A/B at both sizes.
ST3D_AB_VARIANTS="default=,no_tree=ST3D_NO_PLAN_TREE:1" \
  run ab_512 6000 python scripts/ab_bench.py 5
ST3D_AB_SIZE=768 ST3D_AB_VARIANTS="default=,no_tree=ST3D_NO_PLAN_TREE:1" \
  run ab_768 6000 python scripts/ab_bench.py 5

# Headline + ladder refresh (clean host — no CPU suite running).
run bench_cold 10000 python bench.py
run bench_warm 4000 python bench.py
run ladder 9000 python scripts/bench_ladder.py

# Full first-approach wall clock (f32 CLI defaults).
run first_e2e 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --save_intermediate False --output_path /tmp/first_e2e_r4e

echo "=== perf_r4e done $(date) ===" >> "$LOG"
