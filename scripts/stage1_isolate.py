#!/usr/bin/env python
"""Isolated stage-1 timing: v2 vs v3 kernels, fwd and fwd+bwd, at the
bench shapes. One process, interleaved windows (run-variance discipline,
PERF_NOTES round 3). Prints one JSON line per (size, dtype, variant).

Usage: python scripts/stage1_isolate.py [--sizes 512,768] [--iters 30]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512,768")
    ap.add_argument("--iters", default=30, type=int)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "run on the TPU backend"

    from st3d.kernels import stage1_pallas as s1
    from st3d.kernels import stage1v3_pallas as s3

    key = jax.random.PRNGKey(3)

    def make(size, dtype):
        x = jax.random.uniform(key, (4, size, size, 3), dtype)
        w1 = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, 3, 64), jnp.float32) * 0.2)
        b1 = jnp.zeros((64,), jnp.float32)
        w2 = (jax.random.normal(jax.random.fold_in(key, 2),
                                (3, 3, 64, 64), jnp.float32) * 0.05)
        b2 = jnp.zeros((64,), jnp.float32)
        return x, w1.astype(dtype), b1.astype(dtype), \
            w2.astype(dtype), b2.astype(dtype)

    def v2_fwd(x, w1, b1, w2, b2):
        z5, g48, s48 = s1.conv1_1_packed(x, w1, b1)
        p, _ = s1.conv1_2_packed_pool(z5, w2, b2)
        return (jnp.sum(p.astype(jnp.float32) ** 2)
                + 1e-6 * jnp.sum(g48) + 1e-6 * jnp.sum(s48))

    def v3_fwd(x, w1, b1, w2, b2):
        z5, g64 = s3.conv1_1_packed_v3(x, w1, b1)
        p, _ = s3.conv1_2_packed_pool_v3(z5, w2, b2)
        return (jnp.sum(p.astype(jnp.float32) ** 2)
                + 1e-6 * jnp.sum(g64))

    def bench_one(fn, x, ws, iters):
        # Chain iterations through the carry inside ONE jitted scan: each
        # step consumes the previous step's output, so nothing can be
        # elided, reordered, or satisfied from a cache — the first version
        # of this script timed 30 independent dispatches of identical args
        # and measured 0.02ms "per kernel call" (impossible; artifact of
        # the tunneled dispatch path).
        def fwd_scan(x0):
            def step(c, _):
                loss = fn(c, *ws)
                return (c * (1.0 + 0.0 * loss)).astype(c.dtype), loss
            c, losses = jax.lax.scan(step, x0, None, length=iters)
            return losses[-1] + 0.0 * jnp.sum(c[0, 0, 0])

        def gscan(x0):
            gfn = jax.grad(fn)
            def step(c, _):
                gv = gfn(c, *ws)
                return c + 0.0 * gv, jnp.sum(gv[0, 0, 0])
            c, s = jax.lax.scan(step, x0, None, length=iters)
            return s[-1] + 0.0 * jnp.sum(c[0, 0, 0])

        out = {}
        f = jax.jit(fwd_scan)
        jax.block_until_ready(f(x))
        t0 = time.time()
        jax.block_until_ready(f(x))
        out["fwd_ms"] = (time.time() - t0) / iters * 1e3
        g = jax.jit(gscan)
        jax.block_until_ready(g(x))
        t0 = time.time()
        jax.block_until_ready(g(x))
        out["fwdbwd_ms"] = (time.time() - t0) / iters * 1e3
        return out

    for size in [int(s) for s in args.sizes.split(",")]:
        for dtype in (jnp.bfloat16,):
            x, w1, b1, w2, b2 = make(size, dtype)
            ws = (w1, b1, w2, b2)
            res = {}
            # interleave: v2, v3, v2, v3 — two windows each, keep the min
            for rep in range(2):
                for name, fn in (("v2", v2_fwd), ("v3", v3_fwd)):
                    r = bench_one(fn, x, ws, args.iters)
                    if name not in res:
                        res[name] = r
                    else:
                        for k in r:
                            res[name][k] = min(res[name][k], r[k])
            print(json.dumps({
                "size": size, "dtype": jnp.dtype(dtype).name,
                "v2_fwd_ms": round(res["v2"]["fwd_ms"], 3),
                "v3_fwd_ms": round(res["v3"]["fwd_ms"], 3),
                "v2_fwdbwd_ms": round(res["v2"]["fwdbwd_ms"], 3),
                "v3_fwdbwd_ms": round(res["v3"]["fwdbwd_ms"], 3),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
