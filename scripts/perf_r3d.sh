#!/bin/bash
cd "$(dirname "$0")/.."
set -x
{
  echo "=== final bench (gram1 + relufuse + kgroup9 + flat-row scatter) ==="
  timeout 3000 python bench.py
  echo "=== tpu_smoke (kernel defaults changed) ==="
  timeout 3000 python scripts/tpu_smoke.py
  echo "=== 768 ladder ==="
  timeout 3000 python scripts/bench_ladder.py 2>/dev/null || true
} 2>&1
