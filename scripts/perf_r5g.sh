#!/bin/bash
# Round-5g TPU batch: the definitive warm-start numbers at HEAD — both
# approaches end-to-end twice (populate all AOT blobs incl. prep renders,
# then measure warm).
set -u
cd /root/repo
LOG=/tmp/perf_r5g.log
echo "=== perf_r5g start $(date) ===" >> "$LOG"

if [ -f /tmp/perf_r5f.pid ]; then
  while kill -0 "$(cat /tmp/perf_r5f.pid)" 2>/dev/null; do sleep 20; done
fi

run() {
  local name="$1" tmo="$2"; shift 2
  local t0=$SECONDS
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? wall=$((SECONDS - t0))s ($(date)) ---" >> "$LOG"
}

run e2e_fa_populate 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/e2e_fa_p
run e2e_fa_warm 3000 python first_approach.py --size 512 --n_views 4 \
  --batch_size 4 --n_style_transfer_steps 3000 --n_mse_steps 100 \
  --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/e2e_fa_w

run e2e_sa_populate 3000 python second_approach.py --size 512 --n_views 4 \
  --batch_size 4 --epochs 500 --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/e2e_sa_p
run e2e_sa_warm 3000 python second_approach.py --size 512 --n_views 4 \
  --batch_size 4 --epochs 500 --compute_dtype bfloat16 \
  --save_intermediate False --output_path /tmp/e2e_sa_w

echo "=== perf_r5g done $(date) ===" >> "$LOG"
