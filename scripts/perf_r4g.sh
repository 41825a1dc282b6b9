#!/bin/bash
# Round-4g TPU batch: validate + re-baseline after the r4f default flips
# (deep in-kernel Grams conv3_1/4_1/5_1; formally-correct frame scatter).
# Serial, one TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/perf_r4g.log
echo "=== perf_r4g start $(date) ===" >> "$LOG"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? ($(date)) ---" >> "$LOG"
}

# Kernel/donation smoke at the new defaults (regenerates TPU_SMOKE.json).
run smoke 6000 python scripts/tpu_smoke.py

# Headline at HEAD (fresh AOT key for the new defaults -> real compile).
run bench_cold 10000 python bench.py

# Ladder refresh so BENCH_LADDER.json matches HEAD defaults.
run ladder 9000 python scripts/bench_ladder.py

# Fleet refresh at HEAD defaults (r4f's run predated the flips).
run fleet 3000 python scripts/fleet_tpu.py

echo "=== perf_r4g done $(date) ===" >> "$LOG"
