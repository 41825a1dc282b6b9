#!/bin/bash
# Round-5 TPU batch (remaining VERDICT r4 measurement items): config-5
# memory evidence at 512^2 (fleet memlower), the bf16 first-approach
# end-to-end flagship (item 4), the st2d warmup decomposition probe
# (weakness 5), and the official headline bench at HEAD. Serial, one TPU
# process at a time; waits for any already-running smoke first.
set -u
cd /root/repo
LOG=/tmp/perf_r5.log
echo "=== perf_r5 start $(date) ===" >> "$LOG"

# Wait for an in-flight tpu_smoke (launched before this batch).
if [ -f /tmp/smoke.pid ]; then
  while kill -0 "$(cat /tmp/smoke.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}

# WHERE does bench_st2d's 10x-slow first timed window go (targets create
# vs the scan chunk itself)?
run st2d_probe 3000 python scripts/probe_st2d_warmup.py

# Config-5 grid at 512^2 with the XLA memory analysis recorded
# (ST3D_FLEET_MEMLOWER is defaulted on inside the runner).
run fleet512 4000 python scripts/fleet_tpu.py --size 512

# bf16 first-approach flagship: 3000 ST + 100 MSE @512^2 x4 end-to-end
# (the f32 reference-parity default measured 324s in r4; hot-loop rates
# project the bf16 ST phase at ~46s).
run e2e_bf16 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/first_e2e_bf16

# Official headline at HEAD (AOT warm start expected).
run bench 10000 python bench.py

echo "=== perf_r5 done $(date) ===" >> "$LOG"
