#!/usr/bin/env python
"""Resolution ladder: the bench step at 768² (reference default) and
1024² (config-5 size), for the README performance table.

Usage: python scripts/bench_ladder.py   (TPU backend)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax

    import bench

    assert jax.default_backend() == "tpu"
    out = {}
    for size in (768, 1024):
        bench.SIZE = size
        steps, params, opt_state, n = bench.build_step("bfloat16")
        params, opt_state, losses = steps(params, opt_state)
        losses.block_until_ready()
        rates = []
        for _ in range(3):
            t0 = time.time()
            params, opt_state, losses = steps(params, opt_state)
            losses.block_until_ready()
            rates.append(n / (time.time() - t0))
        med = sorted(rates)[1]
        out[size] = round(med, 2)
        print(f"[{size}^2] {med:.2f} it/s  windows={rates}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
