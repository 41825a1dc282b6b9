#!/usr/bin/env python
"""Resolution ladder: the bench step measured at 256/512/768/1024², with
the same timing windows + XLA-cost-analysis MFU numerator as bench.py
(VERDICT r3 item 2: the ladder numbers previously lived only in README
prose — this emits the committed artifact).

Usage: python scripts/bench_ladder.py [--sizes 512,768,1024] [--out PATH]
(TPU backend; one process so rungs are comparable — cross-process run
variance on the tunneled chip is ~8%, PERF_NOTES).

Writes BENCH_LADDER.json: {size: {iters_per_sec, mfu, step_tflops, ...}}.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_SIZES = (256, 512, 768, 1024)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default=",".join(map(str, DEFAULT_SIZES)))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_LADDER.json"))
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    import bench
    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()

    out = {}
    for size in (int(s) for s in args.sizes.split(",") if s):
        bench.SIZE = size
        res = bench.measure(f"tpu_{size}", dtype_name=args.dtype)
        out[str(size)] = {
            k: res[k] for k in (
                "iters_per_sec", "views_per_sec", "mfu", "mfu_analytic_vgg",
                "step_tflops", "flop_source", "compile_s", "rate_windows",
                "compute_dtype", "device_kind",
            )
        }
        print(f"[{size}^2] {res['iters_per_sec']:.2f} it/s  "
              f"mfu={res['mfu']}", file=sys.stderr)
        with open(args.out, "w") as f:  # partial results survive a crash
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
