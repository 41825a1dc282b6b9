#!/bin/bash
# Round-4f TPU batch: the kernel-variant A/Bs that died with the original
# stage1 bug and were never re-run (packed_bwd_v2 / fused_gram_deep /
# scatter_nonunique), plus the FLEET_TPU.json artifact refresh (the 4.74
# epochs/s refresh in PERF_NOTES was measured but the JSON still holds
# the pre-stage1 4.13 run). Serial, one TPU process at a time.
set -u
cd /root/repo
LOG=/tmp/perf_r4f.log
echo "=== perf_r4f start $(date) ===" >> "$LOG"
run() {
  local name="$1" tmo="$2"; shift 2
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? ($(date)) ---" >> "$LOG"
}

# Kernel-variant A/B at the bench point (interleaved, median windows).
ST3D_AB_VARIANTS="default=,packed_bwd_v2=ST3D_PACKED_BWD:v2,fused_gram_deep=ST3D_FUSED_GRAM_DEEP:1,scatter_nonunique=ST3D_SCATTER_NONUNIQUE:1" \
  run ab_kernels 6000 python scripts/ab_bench.py 5

# Fleet artifact refresh (regenerates FLEET_TPU.json at current HEAD).
run fleet 3000 python scripts/fleet_tpu.py

# Headline confirmation at HEAD (AOT-warm).
run bench_warm 4000 python bench.py

echo "=== perf_r4f done $(date) ===" >> "$LOG"
