#!/bin/bash
# Round-3 TPU batch 2: re-run kgroup9 with the scratch-staged patches fix,
# then the kernel smoke and the face-count scaling bench (serial: one TPU).
cd "$(dirname "$0")/.."
set -x
{
  echo "=== variant: default (gram1, ungrouped taps) — warm-cache check ==="
  timeout 3000 python bench.py
  echo "=== variant: + fused conv2_1 gram kernel ==="
  ST3D_FUSED_GRAM2=1 timeout 3000 python bench.py
  echo "=== tpu_smoke ==="
  timeout 3000 python scripts/tpu_smoke.py
  echo "=== bench_faces ==="
  timeout 3000 python scripts/bench_faces.py
  echo "=== perf_trace ==="
  timeout 3000 python scripts/perf_trace.py /tmp/hlo_stats_r3.json
} 2>&1
