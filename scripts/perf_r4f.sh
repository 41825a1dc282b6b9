#!/bin/bash
# ARCHIVAL (round-4f, pre-default-flip): this batch ran BEFORE fused_gram_deep
# became the default and before ST3D_SCATTER_NONUNIQUE was retired (the correct
# scatter is now default; ST3D_SCATTER_UNIQUE restores the old promise). Re-running
# it today would A/B default-vs-default. Kept for provenance of the r4f numbers;
# for current variants see CLAUDE.md's "Perf A/B envs" (ST3D_NO_FUSED_GRAM_DEEP /
# ST3D_SCATTER_UNIQUE). Serial, one TPU process at a time.
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
