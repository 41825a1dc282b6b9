#!/bin/bash
# Round-4d TPU follow-up batch (run AFTER perf_r4c completes — ONE TPU
# process at a time, CLAUDE.md). Green ladder check with the final band
# caps, per-op traces at the new operating points, fleet + e2e re-runs
# with stage1 default-on.
set -u
cd /root/repo
LOG=/tmp/perf_r4d.log
echo "=== perf_r4d start $(date) ===" >> "$LOG"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? ($(date)) ---" >> "$LOG"
}

# 1. Ladder VMEM check must be green with the final caps.
run ladder_check 3000 python scripts/stage1_ladder_check.py

# 1b. 256^2 regressed 173 -> 145 it/s in the r4c ladder: isolate which
#     round-4 default (stage1 / tree) hurts at the small rung.
ST3D_AB_SIZE=256 ST3D_AB_VARIANTS="default=,no_stage1=ST3D_NO_STAGE1_V2:1,no_tree=ST3D_NO_PLAN_TREE:1,neither=ST3D_NO_STAGE1_V2:1+ST3D_NO_PLAN_TREE:1" \
  run ab_256 6000 python scripts/ab_bench.py 5

# 2. Per-op traces at the new operating points (what is the next lever
#    now that stage1 glue and the texture-grad scatter are gone?).
run trace512 4000 python scripts/perf_trace.py /tmp/trace512_r4d.json --size 512
run trace768 4000 python scripts/perf_trace.py /tmp/trace768_r4d.json --size 768

# 3. Config-5 flagship re-run (stage1 engages inside the fleet grid's
#    flattened batch) -> FLEET_TPU.json refresh.
run fleet 6000 python scripts/fleet_tpu.py --size 256 --epochs 6

# 4. End-to-end CLI drive + first-approach wall clock (f32 CLI defaults
#    exercise the f32 stage1 banding on the real chip).
run verify_cli 3000 python first_approach.py --size 128 --n_views 2 \
  --batch_size 2 --n_style_transfer_steps 20 --n_mse_steps 10 \
  --output_path /tmp/verify_out_tpu
run first_e2e 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --save_intermediate False --output_path /tmp/first_e2e_r4d

echo "=== perf_r4d done $(date) ===" >> "$LOG"
