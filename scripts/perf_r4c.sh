#!/bin/bash
# Round-4c TPU measurement batch: stage1_v2 default-ON validation.
# Serial — ONE TPU process at a time (CLAUDE.md). Appends to
# /tmp/perf_r4c.log. Ordered: fail-fast ladder compile check, smoke
# (TPU_SMOKE.json must go green), 512 A/B (does the +23% default hold),
# official bench cold+warm, ladder artifact, 768/1024 A/B, hot loop A.
set -u
cd /root/repo
LOG=/tmp/perf_r4c.log
echo "=== perf_r4c start $(date) ===" >> "$LOG"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "--- $name: $* ($(date)) ---" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "--- $name rc=$? ($(date)) ---" >> "$LOG"
}

# 0. Fail-fast: stage1 kernels compile + finite grads at every rung.
run ladder_check 3000 python scripts/stage1_ladder_check.py

# 1. Kernel/donation smoke -> TPU_SMOKE.json (now includes the f32
#    stage1 bwd methodology; MUST be green before anything ships).
run smoke 4000 python scripts/tpu_smoke.py

# 2. 512 A/B: default (stage1 ON) vs no_stage1 vs the rest.
run ab_512 6000 python scripts/ab_bench.py 7

# 3. Official bench cold (fresh AOT blob for the new default graph)
#    then warm (AOT load check).
run bench_cold 10000 python bench.py
run bench_warm 4000 python bench.py

# 4. Ladder artifact refresh (BENCH_LADDER.json).
run ladder 9000 python scripts/bench_ladder.py

# 5. 768/1024: default vs no_stage1 (VMEM fix + win breadth).
ST3D_AB_SIZE=768 ST3D_AB_VARIANTS="default=,no_stage1=ST3D_NO_STAGE1_V2:1" \
  run ab_768 6000 python scripts/ab_bench.py 5
ST3D_AB_SIZE=1024 ST3D_AB_VARIANTS="default=,no_stage1=ST3D_NO_STAGE1_V2:1" \
  run ab_1024 6000 python scripts/ab_bench.py 5

# 6. Hot loop A with stage1 (BENCH_ST2D.json refresh).
run st2d 3000 python scripts/bench_st2d.py

echo "=== perf_r4c done $(date) ===" >> "$LOG"
