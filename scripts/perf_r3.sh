#!/bin/bash
# Round-3 perf experiment batch: run ALL TPU variants in ONE serial script
# (concurrent TPU python processes serialize — CLAUDE.md). Each line is a
# full bench.py run; the persistent compile cache makes repeats cheap.
cd "$(dirname "$0")/.."
set -x
{
  echo "=== variant: r2-baseline (KGROUP=1, no gram1) ==="
  ST3D_CONV_KGROUP=1 ST3D_NO_GRAM1=1 timeout 3000 python bench.py
  echo "=== variant: kgroup9 only ==="
  ST3D_NO_GRAM1=1 timeout 3000 python bench.py
  echo "=== variant: gram1 only ==="
  ST3D_CONV_KGROUP=1 timeout 3000 python bench.py
  echo "=== variant: kgroup9 + gram1 (new default) ==="
  timeout 3000 python bench.py
  echo "=== variant: kgroup3 + gram1 ==="
  ST3D_CONV_KGROUP=3 timeout 3000 python bench.py
} 2>&1
