
#!/bin/bash
cd /root/repo
set -x
{
  echo "=== ab_bench (5 variants interleaved) ==="
  timeout 5400 python scripts/ab_bench.py 7
  echo "=== bench_faces (fixed TPU backend) ==="
  timeout 3000 python scripts/bench_faces.py
  echo "=== cache probe x2 ==="
  timeout 900 python scripts/cache_probe.py 2>&1 | tail -5
  timeout 900 python scripts/cache_probe.py 2>&1 | tail -5
} 2>&1
