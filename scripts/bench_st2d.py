#!/usr/bin/env python
"""Hot loop A (the 2D style-transfer engine) throughput + first-approach
phase decomposition (VERDICT r3 item 3: hot loop A ran 25 it/s where the
strictly-larger 3D step ran 35.9 — the NCHW pixel buffer's per-step
transpose pair was the visible gap; the buffer is NHWC now).

Measures, at the bench workload shape (4 views @512², bf16 VGG):
  * 2D-ST optimization it/s (the loop that runs 3000 steps/batch in the
    first approach — its wall-clock dominates, SURVEY §3.1);
  * projected first-approach batch wall clock (3000 ST + 100 MSE steps).

Usage: python scripts/bench_st2d.py [--size 512] [--views 4] [--steps 200]
Writes BENCH_ST2D.json at the repo root.
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
    ap.add_argument("--size", default=512, type=int)
    ap.add_argument("--views", default=4, type=int)
    ap.add_argument("--steps", default=200, type=int)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_ST2D.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from st3d.engine.style_transfer2d import style_transfer
    from st3d.io.image import load_as_tensor
    from st3d.models.vgg import get_vgg
    from st3d.utils.assets import resolve_asset
    from st3d.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    size, views = args.size, args.views

    vgg = get_vgg()
    style = load_as_tensor(resolve_asset("./imgs/Style_1.jpg"), size)
    style_b = jnp.broadcast_to(style[None], (views,) + style.shape)
    try:
        content = load_as_tensor(resolve_asset("./imgs/Style_3.jpg"), size)
    except FileNotFoundError:
        content = style
    content_b = jnp.broadcast_to(content[None], (views,) + style.shape)
    init = content_b

    # Measurement discipline, learned the hard way through the tunneled
    # chip (round 5 — each protection below was added after a measured
    # failure):
    #   * every window CHAINS its input from the previous window's output
    #     (identical-arg re-dispatch got served at 100-212 "it/s");
    #   * every window ends with a host VALUE fetch, not
    #     block_until_ready — blocking on the transposed output of the
    #     donated scan chain returned before device work completed
    #     (chained windows "measured" 146-160 it/s, above the step's
    #     ~102 it/s conv-roofline ceiling; the stage's total wall pinned
    #     the true rate at ~37);
    #   * the total over all windows is recorded as total_wall_rate — the
    #     number that cannot lie — and the headline refuses to exceed it.
    chunk = min(args.steps, 100)

    def run_window(cur):
        out = style_transfer(cur, content_b, style_b, vgg,
                             steps=args.steps, chunk=chunk,
                             progress=False, dtype=dtype)
        float(out[0, 0, 0, 0])          # true completion barrier
        return out

    t0 = time.time()
    cur = style_transfer(init, content_b, style_b, vgg, steps=chunk,
                         chunk=chunk, progress=False, dtype=dtype)
    float(cur[0, 0, 0, 0])
    compile_s = time.time() - t0

    # Adaptive settling, untimed chained windows mirroring a timed one:
    # after the warmup call returns, tunnel-side async work keeps landing
    # for ~80s independent of the call pattern (measured: one settle pass
    # 43.7s AND the next window 38s both ~10x slow, then steady). Settle
    # until two consecutive rates agree within 10%, recorded in the
    # artifact.
    settle_rates = []
    for _ in range(5):
        t0 = time.time()
        cur = run_window(cur)
        settle_rates.append(args.steps / (time.time() - t0))
        if (len(settle_rates) >= 2
                and abs(settle_rates[-1] / settle_rates[-2] - 1) < 0.10):
            break

    # Timed: three chained windows, median, capped by the all-windows
    # wall rate (run variance discipline, PERF_NOTES).
    rates = []
    t_all = time.time()
    for _ in range(3):
        t0 = time.time()
        cur = run_window(cur)
        rates.append(args.steps / (time.time() - t0))
    total_wall_rate = 3 * args.steps / (time.time() - t_all)
    it_s = min(sorted(rates)[1], total_wall_rate)

    res = {
        "workload": f"2D style transfer, {views} views @{size}^2, "
                    f"{args.dtype}",
        "iters_per_sec": round(it_s, 3),
        "rate_windows": [round(r, 3) for r in rates],
        "total_wall_rate": round(total_wall_rate, 3),
        "compile_s": round(compile_s, 1),
        "settle_windows": [round(r, 3) for r in settle_rates],
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        # First-approach batch projection: 3000 ST steps at this rate
        # (MSE-phase rate comes from bench.py's 3D step measurement).
        "projected_3000_st_steps_s": round(3000.0 / it_s, 1),
    }
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
